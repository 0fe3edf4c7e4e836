"""Tiled Pallas TPU kernel for the nonbonded pair sum.

The hot op of the framework: all-pairs softcore LJ + electrostatics with
forces, replacing OpenMM's CUDA direct-space nonbonded kernels (the compute
core the reference delegates every step to, SURVEY.md 2.3). The kernel
computes energy AND analytic forces in one pass over (TILE x TILE) blocks
held in VMEM, so per force evaluation each atom tile is read N/TILE times
from HBM and no O(N^2) intermediate ever exists. The per-pair math is the
shared `potentials.pairs` formulas — identical to the dense/tiled jnp
backends, which serve as its correctness references.

Active-row compaction: with frozen atoms (the reference's freeze_radius
production protocol, examples/rotmove_cuda.yml:42-45) only mobile-or-
alchemical rows are computed against all columns — an ~Nr/N reduction of
the pair count; see PairFeatures in potentials/tiled.py for the energy
bookkeeping (row-row pairs weighted 0.5, row-frozen 1.0).

Layout: atoms live in (8, Np) transposed arrays (8 = f32 sublane tile).
Column features: rows 0-4 = q_std, q_alch, sigma, epsilon, in_rows.
Row features: same 0-3 plus row 4 = alch flag of the row atom... (see
builders below). Coordinates travel in separate (8, Np)/(8, Nr) arrays
(rows 0-2). Outputs are (8, Nr): force rows 0-2, per-row weighted energy
row 3. The j grid dimension is innermost so the row-tile output block stays
resident while all column tiles accumulate into it.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..pairs import pair_energy_force
from ..tiled import PairFeatures

TILE = 256  # column (lane) tile
TILE_R = 128  # row (sublane) tile: halves the padding waste for small
# frozen-row counts (rows pad to 256 in PairFeatures, a multiple of 128)

# feature-row indices (column array); F_CGID = global atom id of the column
# (f32, exact for n < 2^24; -1 marks padded column slots)
F_QSTD, F_QALCH, F_SIG, F_EPS, F_ALCH, F_INROWS, F_CGID = 0, 1, 2, 3, 4, 5, 6
# extra rows in the row-side feature array
R_GID, R_VALID = 5, 6
#: column slot 7 = 1.0 only in the FIRST column tile: the output-block
#: zero-init flag. Data, not pl.program_id — jax.vmap PREPENDS a grid
#: dimension, so program_id(1) would silently point at the row dimension
#: under replica batching (wrong accumulation = wrong physics).
F_FIRST = 7


def _make_kernel(method, cutoff, alpha_ewald, k_rf, c_rf, ann, softcore_alpha, periodic, n_atoms, switch_distance=None, alch_coulomb=False):
    use_cutoff = method in ("PME", "CutoffPeriodic", "CutoffNonPeriodic")

    def kernel(params_ref, xi_ref, xj_ref, fi_ref, fj_ref, out_ref):
        is_first = fj_ref[F_FIRST, 0] > 0  # vmap-safe init flag (see F_FIRST)

        lam_s = params_ref[0, 0]
        f_na = params_ref[0, 1]
        f_aa = params_ref[0, 2]

        # pairwise displacements per dimension, minimum image
        dxs = []
        r2 = jnp.zeros((TILE_R, TILE), jnp.float32)
        for d in range(3):
            xi = xi_ref[d, :][:, None]
            xj = xj_ref[d, :][None, :]
            dx = xi - xj
            if periodic:
                L = params_ref[0, 3 + d]
                dx = dx - L * jnp.round(dx / L)
            dxs.append(dx)
            r2 = r2 + dx * dx

        gid_i = fi_ref[R_GID, :][:, None]  # global atom id of the row (f32)
        cj = fj_ref[F_CGID, :][None, :]  # global atom id of the column
        valid = (gid_i != cj) & (fi_ref[R_VALID, :][:, None] > 0) & (cj >= 0)
        if use_cutoff:
            valid = valid & (r2 < cutoff * cutoff)
        r2 = jnp.maximum(r2, 1e-6)

        qs_i = fi_ref[F_QSTD, :][:, None]
        qs_j = fj_ref[F_QSTD, :][None, :]
        qa_i = fi_ref[F_QALCH, :][:, None]
        qa_j = fj_ref[F_QALCH, :][None, :]
        sij = 0.5 * (fi_ref[F_SIG, :][:, None] + fj_ref[F_SIG, :][None, :])
        eij = jnp.sqrt(fi_ref[F_EPS, :][:, None] * fj_ref[F_EPS, :][None, :])
        ai = fi_ref[F_ALCH, :][:, None]
        aj = fj_ref[F_ALCH, :][None, :]
        aa = ai * aj
        na = ai + aj - 2.0 * aa
        scale_ster = na + ann * aa

        e, g = pair_energy_force(
            r2,
            sij,
            eij,
            qs_i * qs_j,
            qs_i * qa_j + qa_i * qs_j,
            qa_i * qa_j,
            scale_ster,
            lam_sterics=lam_s,
            f_na=f_na,
            f_aa=f_aa,
            method=method,
            alpha_ewald=alpha_ewald,
            k_rf=k_rf,
            c_rf=c_rf,
            softcore_alpha=softcore_alpha,
            switch_distance=switch_distance,
            cutoff=cutoff,
            alch_coulomb=alch_coulomb,
        )
        e = jnp.where(valid, e, 0.0)
        g = jnp.where(valid, g, 0.0)
        # row-row pairs counted from both sides -> weight 0.5
        wcol = 1.0 - 0.5 * fj_ref[F_INROWS, :][None, :]

        @pl.when(is_first)
        def _():
            out_ref[:, :] = jnp.zeros((8, TILE_R), jnp.float32)

        for d in range(3):
            out_ref[d, :] += -jnp.sum(g * dxs[d], axis=1)
        out_ref[3, :] += jnp.sum(wcol * e, axis=1)

    return kernel


def make_pallas_pair_sum(
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
    interpret: bool = None,
    col_idx=None,
    alch_coulomb: bool = False,
):
    """Same interface as make_tiled_pair_sum: pair_sum(x, box, lam_s, f_na,
    f_aa) -> (E, F), with .energy exposing a custom-VJP scalar function.

    col_idx: optional static global indices of the column subset (frozen-
    system column culling: with a cutoff method, only atoms within reach of
    the mobile rows can interact — the caller guarantees completeness via a
    displacement guard). None = all atoms."""
    global pl, pltpu
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    n, npad = feats.n_atoms, feats.n_padded
    nr, nr_pad = feats.n_rows, feats.n_rows_padded
    full_cols = col_idx is None
    cols_np = np.arange(n, dtype=np.int64) if full_cols else np.asarray(col_idx, np.int64)
    nc = len(cols_np)
    ncpad = ((nc + TILE - 1) // TILE) * TILE
    n_col_tiles = ncpad // TILE
    n_row_tiles = nr_pad // TILE_R
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # column features, gathered onto the (possibly culled) column subset
    feat_cols = np.zeros((8, ncpad), np.float32)
    feat_full = {
        F_QSTD: feats.q_std, F_QALCH: feats.q_alch, F_SIG: feats.sigma,
        F_EPS: feats.epsilon, F_ALCH: feats.alch, F_INROWS: feats.in_rows,
    }
    for k, arr in feat_full.items():
        feat_cols[k, :nc] = np.asarray(arr)[cols_np]
    feat_cols[F_CGID, :nc] = cols_np.astype(np.float32)
    feat_cols[F_CGID, nc:] = -1.0
    feat_cols[F_FIRST, :TILE] = 1.0  # first-tile init flag (see F_FIRST doc)
    # row features: compacted + global id + validity
    rows = np.asarray(feats.row_idx)
    feat_rows = np.zeros((8, nr_pad), np.float32)
    for k in (F_QSTD, F_QALCH, F_SIG, F_EPS, F_ALCH):
        feat_rows[k] = np.asarray(feat_full[k])[rows]
    feat_rows[R_GID] = rows.astype(np.float32)
    feat_rows[R_VALID] = (np.arange(nr_pad) < nr).astype(np.float32)
    feat_cols = jnp.asarray(feat_cols)
    feat_rows = jnp.asarray(feat_rows)
    row_idx = jnp.asarray(rows)
    cols_j = jnp.asarray(cols_np.astype(np.int32))
    row_live = jnp.asarray((np.arange(nr_pad) < nr)[:, None].astype(np.float32))

    kernel = _make_kernel(
        method, cutoff, alpha_ewald, k_rf, c_rf,
        1.0 if annihilate_sterics else 0.0, softcore_alpha, periodic, n,
        switch_distance=switch_distance, alch_coulomb=alch_coulomb,
    )

    # park padded atoms far apart (q = eps = 0 anyway)
    pad_tail = 1e3 * (1.0 + np.arange(ncpad - nc, dtype=np.float32))

    grid_spec = pl.GridSpec(
        grid=(n_row_tiles, n_col_tiles),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, TILE_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TILE_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
    )

    flops_per_pair = 60
    cost = pl.CostEstimate(
        flops=flops_per_pair * nr_pad * ncpad,
        bytes_accessed=4 * (8 * ncpad) * (2 * n_row_tiles + 1),
        transcendentals=2 * nr_pad * ncpad,
    )

    def _pass(x, box, lam_s, f_na, f_aa):
        xf = x.astype(jnp.float32)
        xc = xf.T if full_cols else xf[cols_j].T  # (3, nc)
        xt = jnp.zeros((8, ncpad), jnp.float32)
        xt = xt.at[0:3, :nc].set(xc)
        xt = xt.at[0:3, nc:].set(jnp.asarray(pad_tail)[None, :])
        # row-compacted coordinates from global row ids (row pads alias
        # atom 0; masked by R_VALID)
        xr = jnp.zeros((8, nr_pad), jnp.float32).at[0:3].set(xf[row_idx].T)
        blen = jnp.diagonal(box).astype(jnp.float32) if box is not None else jnp.ones(3, jnp.float32)
        params = jnp.zeros((1, 8), jnp.float32)
        params = params.at[0, 0].set(jnp.asarray(lam_s, jnp.float32))
        params = params.at[0, 1].set(jnp.asarray(f_na, jnp.float32))
        params = params.at[0, 2].set(jnp.asarray(f_aa, jnp.float32))
        params = params.at[0, 3:6].set(blen)

        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, nr_pad), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(params, xr, xt, feat_rows, feat_cols)
        f_rows = out[0:3].T * row_live  # (Nr_pad, 3)
        f = (
            jnp.zeros((npad, 3), jnp.float32)
            .at[row_idx]
            .add(f_rows)[:n]
            .astype(x.dtype)
        )
        e = jnp.sum(out[3, :]).astype(x.dtype)
        return e, f

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
