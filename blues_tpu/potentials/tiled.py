"""Scan-tiled O(N^2) pair sum without materializing N x N.

The production-scale nonbonded backend for systems too large for the dense
path (e.g. the 22,340-atom T4-toluene config, reference:
examples/rotmove_cuda.yml). A `lax.scan` over row tiles computes
(TILE, N) blocks — XLA keeps HBM traffic to a few fused temporaries and the
VPU does the per-pair math. Forces are computed analytically in the same
pass (radial factor from potentials.pairs), exposed to autodiff through a
custom VJP, so `value_and_grad` costs ONE pass instead of forward+reverse.

The Pallas kernel (pallas/pair_kernel.py) computes identical math with
explicit VMEM tiling; this implementation is its correctness reference and
the CPU/test backend.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .pairs import pair_energy_force

TILE = 256


class PairFeatures(NamedTuple):
    """Static per-atom feature arrays for the pair backends (padded to a
    multiple of TILE).

    ``active_rows``: when some atoms are frozen (zero mass, the reference's
    freeze_radius production protocol, examples/rotmove_cuda.yml:42-45),
    only rows for mobile-or-alchemical atoms are computed. Frozen-frozen
    pair energies are constants that cancel in every NCMC work difference,
    the Metropolis delta, and the alchemical correction, so dropping them
    changes reported absolute PE by a constant only. Row-row pairs weigh
    0.5 (counted from both sides), row-frozen pairs weigh 1.0."""

    q_std: np.ndarray  # (Np,) non-alchemical charges (alch zeroed)
    q_alch: np.ndarray  # (Np,) alchemical charges (others zeroed)
    sigma: np.ndarray  # (Np,)
    epsilon: np.ndarray  # (Np,)
    alch: np.ndarray  # (Np,) 0/1
    in_rows: np.ndarray  # (Np,) 0/1 - atom is an active row
    row_idx: np.ndarray  # (Nr_pad,) global indices of active rows
    n_rows: int
    n_rows_padded: int
    n_atoms: int
    n_padded: int


def build_pair_features(charge, sigma, epsilon, alch_mask, active_rows=None) -> PairFeatures:
    n = len(charge)
    npad = ((n + TILE - 1) // TILE) * TILE
    pad = lambda a: np.pad(np.asarray(a, np.float64), (0, npad - n))
    a = np.asarray(alch_mask, np.float64)
    if active_rows is None:
        rows = np.arange(n, dtype=np.int32)
        in_rows = np.ones(n)
    else:
        rows = np.asarray(active_rows, np.int32)
        in_rows = np.zeros(n)
        in_rows[rows] = 1.0
    nr = len(rows)
    nr_pad = ((nr + TILE - 1) // TILE) * TILE
    rows_p = np.pad(rows, (0, nr_pad - nr))  # pad with atom 0; masked by n_rows
    return PairFeatures(
        q_std=pad(charge * (1.0 - a)),
        q_alch=pad(charge * a),
        sigma=pad(sigma),
        epsilon=pad(epsilon),
        alch=pad(a),
        in_rows=pad(in_rows),
        row_idx=rows_p,
        n_rows=nr,
        n_rows_padded=nr_pad,
        n_atoms=n,
        n_padded=npad,
    )


def make_tiled_pair_sum(
    feats: PairFeatures,
    *,
    method: str,
    cutoff: float,
    alpha_ewald: float,
    k_rf: float,
    c_rf: float,
    annihilate_sterics: bool,
    softcore_alpha: float = 0.5,
    periodic: bool = True,
    switch_distance: float = None,
    col_idx=None,
    alch_coulomb: bool = False,
    no_min_image: bool = False,
    col_shift=None,
    center=None,
    excl_mask=None,
    col_const_positions=None,
    col_mobile_sel=None,
    col_mobile_gid=None,
):
    """Returns pair_sum(x, box, lam_s, f_na, f_aa) -> (E, F) with custom VJP
    on the energy (F reused as the pullback).

    col_idx: optional static global indices of the column subset (frozen-
    system column culling; caller guarantees completeness via a displacement
    guard). None = all atoms.

    no_min_image: skip the per-pair minimum-image wrap AND compute forces
    via the matmul identity f_i = (x_i - c0) * sum_j g_ij - g @ (x_c - c0)
    instead of contracting against the (rows, cols, 3) displacement tensor
    (which XLA materializes for the einsum — the dominant HBM cost of the
    frozen-production step at 64 replicas). Sound ONLY when the caller has
    verified the spatial-extent condition (nonbonded._no_image_geometry):
    every possible in-cutoff pair's raw displacement IS its minimum image,
    and out-of-cutoff pairs have raw r2 > cutoff^2 (their g is masked to 0,
    so they drop out of both matmuls exactly). ``col_shift`` (nc, 3) are
    static lattice shifts applied to the gathered column positions (frozen
    columns near a box face are moved to the image nearest the site);
    ``center`` recenters coordinates in the identity to cut f32
    cancellation. Requires col_idx (the culled frozen path).

    col_const_positions: (nc, 3) static column positions (frozen atoms
    never move, so the caller bakes them — including any col_shift — as a
    compile-time constant); col_mobile_sel/col_mobile_gid then name the
    (few) mobile columns to refresh from the runtime array. Removes the
    per-eval (nc,) gather over the full position array. Exactly
    equivalent: the kernel's custom VJP returns analytic ROW forces only,
    so column positions never carry gradient.

    excl_mask: static (n_rows_padded, ncpad) bool, True = this (row, col)
    pair is an exclusion and must be SKIPPED at build time rather than
    computed and subtracted afterwards. Required with no_min_image: an
    excluded bonded pair's radial factor is ~1e8, and the matmul identity
    turns that into eps * |g| * |x - c0| ~ 10 kJ/mol/nm of f32 force error
    that the rest-term subtraction cannot cancel (it never saw it). The
    caller must correspondingly NOT subtract these pairs in its exclusion
    correction."""
    n, npad = feats.n_atoms, feats.n_padded
    nr, nr_pad = feats.n_rows, feats.n_rows_padded
    n_row_tiles = nr_pad // TILE
    row_idx = jnp.asarray(feats.row_idx)
    ann = 1.0 if annihilate_sterics else 0.0
    use_cutoff = method in ("PME", "CutoffPeriodic", "CutoffNonPeriodic")
    full_cols = col_idx is None
    if no_min_image and (full_cols or not use_cutoff):
        raise ValueError("no_min_image requires a culled column subset and a cutoff")
    c0_np = np.zeros(3) if center is None else np.asarray(center, np.float64)
    if not full_cols:
        cols_np = np.asarray(col_idx, np.int64)
        nc = len(cols_np)
        ncpad = ((nc + TILE - 1) // TILE) * TILE
        col_gid_np = np.full(ncpad, -1.0, np.float64)
        col_gid_np[:nc] = cols_np
        cols_pad_np = np.concatenate([cols_np, np.zeros(ncpad - nc, np.int64)])
        col_pad_pos = 1e3 * (1.0 + np.arange(ncpad - nc))
    else:
        nc, ncpad = n, npad
    if excl_mask is not None:
        em = np.asarray(excl_mask, bool)
        if em.shape[0] > nr_pad or em.shape[1] > ncpad:
            raise ValueError(f"excl_mask {em.shape} exceeds ({nr_pad}, {ncpad})")
        excl_mask = np.zeros((nr_pad, ncpad), bool)
        excl_mask[: em.shape[0], : em.shape[1]] = em

    def _pass(x, box, lam_s, f_na, f_aa):
        dtype = x.dtype
        # features at the positions dtype: f32 in production, full f64 under
        # enable_x64 (the golden-parity tests) — hard-rounding to f32 here
        # while the exclusion subtraction runs in f64 leaves uncancelled
        # rounding error on the huge excluded bonded-overlap LJ terms
        qs = jnp.asarray(feats.q_std, dtype)
        qa = jnp.asarray(feats.q_alch, dtype)
        sig = jnp.asarray(feats.sigma, dtype)
        eps = jnp.asarray(feats.epsilon, dtype)
        af = jnp.asarray(feats.alch, dtype)
        inr = jnp.asarray(feats.in_rows, dtype)
        xp = jnp.zeros((npad, 3), dtype).at[:n].set(x)
        # park padded atoms on a far-away diagonal line so r2 > 0 always;
        # their q/eps are zero so they contribute nothing inside the cutoff
        pad_pos = 1e3 * (1.0 + jnp.arange(npad - n, dtype=dtype))[:, None] * jnp.ones(3, dtype)
        xp = xp.at[n:].set(pad_pos)
        blen = jnp.diagonal(box).astype(dtype) if box is not None else None

        if full_cols:
            col_gid = jnp.arange(npad)
            xpc = xp
            qs_c, qa_c, sig_c, eps_c, af_c, inr_c = qs, qa, sig, eps, af, inr
        else:
            col_gid = jnp.asarray(col_gid_np, dtype)
            if col_const_positions is not None:
                xc_live = jnp.asarray(np.asarray(col_const_positions), dtype)
                if col_mobile_sel is not None and len(col_mobile_sel):
                    xc_live = xc_live.at[jnp.asarray(col_mobile_sel)].set(
                        x[jnp.asarray(col_mobile_gid)]
                    )
            else:
                xc_live = x[jnp.asarray(cols_pad_np[:nc])]
                if col_shift is not None:
                    xc_live = xc_live + jnp.asarray(np.asarray(col_shift), dtype)
            xpc = jnp.concatenate(
                [
                    xc_live,
                    jnp.asarray(col_pad_pos, dtype)[:, None] * jnp.ones(3, dtype),
                ]
            )
            qs_c = qs[jnp.asarray(cols_pad_np)].at[nc:].set(0.0)
            qa_c = qa[jnp.asarray(cols_pad_np)].at[nc:].set(0.0)
            sig_c = sig[jnp.asarray(cols_pad_np)]
            eps_c = eps[jnp.asarray(cols_pad_np)].at[nc:].set(0.0)
            af_c = af[jnp.asarray(cols_pad_np)].at[nc:].set(0.0)
            inr_c = inr[jnp.asarray(cols_pad_np)].at[nc:].set(0.0)
        # row-compacted per-atom arrays (global order when no freezing)
        xr = xp[row_idx]  # (Nr_pad, 3)
        row_global = row_idx

        c0 = jnp.asarray(c0_np, dtype)

        def row_block(carry, i0):
            e_acc = carry
            xi = jax.lax.dynamic_slice(xr, (i0, 0), (TILE, 3))
            gidx = jax.lax.dynamic_slice(row_global, (i0,), (TILE,))
            dr = xi[:, None, :] - xpc[None, :, :]
            if periodic and blen is not None and not no_min_image:
                dr = dr - blen * jnp.round(dr / blen)
            r2 = jnp.sum(dr * dr, -1)
            local = i0 + jnp.arange(TILE)
            valid = (gidx[:, None] != col_gid[None, :]) & (local[:, None] < nr)
            if excl_mask is not None:
                valid = valid & ~jax.lax.dynamic_slice(
                    jnp.asarray(excl_mask), (i0, 0), (TILE, excl_mask.shape[1])
                )
            if use_cutoff:
                valid = valid & (r2 < cutoff * cutoff)
            r2 = jnp.maximum(r2, 1e-6)

            def sl(a):
                return a[gidx]

            ai = sl(af)[:, None]
            aj = af_c[None, :]
            aa = ai * aj
            na = ai + aj - 2.0 * aa
            scale_ster = na + ann * aa
            sij = 0.5 * (sl(sig)[:, None] + sig_c[None, :])
            eij = jnp.sqrt(sl(eps)[:, None] * eps_c[None, :])
            qq_std = sl(qs)[:, None] * qs_c[None, :]
            qq_na = sl(qs)[:, None] * qa_c[None, :] + sl(qa)[:, None] * qs_c[None, :]
            qq_aa = sl(qa)[:, None] * qa_c[None, :]
            e, g = pair_energy_force(
                r2, sij, eij, qq_std, qq_na, qq_aa, scale_ster,
                lam_sterics=lam_s, f_na=f_na, f_aa=f_aa, method=method,
                alpha_ewald=alpha_ewald, k_rf=k_rf, c_rf=c_rf,
                softcore_alpha=softcore_alpha,
                switch_distance=switch_distance, cutoff=cutoff,
                alch_coulomb=alch_coulomb,
            )
            e = jnp.where(valid, e, 0.0)
            g = jnp.where(valid, g, 0.0)
            if no_min_image:
                # f_i = -sum_j g_ij dr_ijd with dr = xi - xc exactly (no
                # wrap needed for unmasked pairs; masked pairs have g = 0):
                # two MXU contractions instead of materializing the
                # (TILE, ncols, 3) tensor for the einsum. Recentered at c0
                # so the two partial sums stay small (f32 cancellation).
                gsum = jnp.sum(g, axis=1, keepdims=True)
                f_i = -(
                    (xi - c0) * gsum
                    - jnp.dot(g, xpc - c0, preferred_element_type=dtype)
                )
            else:
                f_i = -jnp.einsum("ij,ijd->id", g, dr)
            # row-row pairs appear from both sides (0.5); row-frozen once (1.0)
            wcol = 1.0 - 0.5 * sl(inr)[:, None] * inr_c[None, :]
            e_acc = e_acc + jnp.sum(wcol * e)
            return e_acc, f_i

        e_total, f_tiles = jax.lax.scan(
            row_block, jnp.zeros((), dtype), jnp.arange(n_row_tiles) * TILE
        )
        f_rows = f_tiles.reshape(nr_pad, 3)
        f = jnp.zeros((npad, 3), dtype).at[row_global].add(
            f_rows * (jnp.arange(nr_pad) < nr)[:, None]
        )[:n]
        return e_total, f

    @jax.custom_vjp
    def pair_energy(x, box, lam_s, f_na, f_aa):
        e, _ = _pass(x, box, lam_s, f_na, f_aa)
        return e

    def fwd(x, box, lam_s, f_na, f_aa):
        e, f = _pass(x, box, lam_s, f_na, f_aa)
        return e, (f, box, lam_s, f_na, f_aa)

    def bwd(res, ct):
        f, box, lam_s, f_na, f_aa = res
        return (
            -f * ct,
            jnp.zeros_like(box),
            jnp.zeros_like(lam_s),
            jnp.zeros_like(f_na),
            jnp.zeros_like(f_aa),
        )

    pair_energy.defvjp(fwd, bwd)

    def pair_sum(x, box, lam_s, f_na, f_aa):
        return _pass(x, box, lam_s, f_na, f_aa)

    pair_sum.energy = pair_energy
    return pair_sum
