"""Verlet neighbor-list nonbonded backend: (N, K) padded neighbor lists.

The TPU-native analog of OpenMM's neighbor lists (SURVEY.md 2.3) for large
mostly-mobile systems, one level beyond the cell-list backend
(potentials/cells.py): where the cell backend evaluates the full 27-cell
candidate neighborhood every step (~164M pair slots at 22k atoms), this
backend compacts the candidates once into a static-shape (N, K) neighbor
index table (≈14M slots) that stays valid while no atom moves farther than
skin/2 from its build position — the classic Verlet-list construction, under
XLA's static-shape rules:

  * build(x, box): bin atoms into cells of edge >= cutoff + skin, gather the
    27-cell candidate blocks, keep candidates with r < cutoff + skin, and
    compact each row's hits to K slots with lax.top_k over negated r^2
    (ghost index n pads the tail). Overflow (more hits than K, or a cell
    over capacity) flags the list invalid.
  * apply(nlist, x, box, ...): gathered (chunk, K) feature blocks + the
    shared potentials.pairs formulas. Lists are symmetric (r^2 is computed
    identically from both sides and overflow poisons rather than truncates),
    so each pair appears in both rows: energies weigh 0.5 and forces are
    pure row reductions — no scatter in the hot path.
  * the energy is poisoned to NaN when the list is stale (max displacement
    since build > skin/2), overflowed, or the box shrank below the grid's
    validity — the driver's NaN semantics reject/roll back instead of
    computing silently wrong physics (SURVEY.md 5.2).

The stateless `pair_sum(x, box, ...)` interface rebuilds per evaluation
(correct anywhere); MD drivers amortize via `pair_sum.build` +
`pair_sum.apply` every `rebuild_interval` steps (simulation/driver.py).
Frozen systems route to the column-culled pallas/tiled kernels instead
(row compaction beats a list when almost everything is frozen).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .pairs import pair_energy_force
from .tiled import PairFeatures

#: atoms per build/apply chunk (bounds the materialized blocks)
ROW_CHUNK = 2048


def _grid_shape(box_lengths, r_list, shrink_margin=0.97):
    return np.maximum(
        (np.asarray(box_lengths) * shrink_margin / r_list).astype(int), 1
    )


def _neighbor_table(ncells):
    nx, ny, nz = (int(v) for v in ncells)
    nc_tot = nx * ny * nz
    ids = np.arange(nc_tot).reshape(nx, ny, nz)
    offsets = [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ]
    table = np.full((nc_tot, 27), nc_tot, np.int32)
    for cx in range(nx):
        for cy in range(ny):
            for cz in range(nz):
                seen = []
                for dx, dy, dz in offsets:
                    c = ids[(cx + dx) % nx, (cy + dy) % ny, (cz + dz) % nz]
                    if c not in seen:
                        seen.append(c)
                table[ids[cx, cy, cz], : len(seen)] = seen
    return table


def make_verlet_pair_sum(
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
    box0=None,
    skin: float = 0.1,
    capacity: int = None,
    alch_coulomb: bool = False,
):
    """Same stateless interface as make_tiled_pair_sum, plus
    .build(x, box) -> nlist and .apply(nlist, x, box, lam_s, f_na, f_aa).

    Requires a periodic box and all atoms active (no frozen compaction —
    frozen systems use the culled pallas/tiled kernels)."""
    if not periodic or box0 is None:
        raise ValueError("verlet backend requires a periodic box")
    n = feats.n_atoms
    if feats.n_rows != n:
        raise ValueError(
            "verlet backend requires all atoms active; frozen systems use "
            "the column-culled pallas/tiled kernels"
        )
    r_list = cutoff + skin
    L0 = np.diag(np.asarray(box0, np.float64))
    ncells = _grid_shape(L0, r_list)
    nc_tot = int(np.prod(ncells))
    if nc_tot < 27:
        raise ValueError(f"grid {tuple(ncells)} too small for a verlet list")
    mean_occ = n / nc_tot
    cap = max(int(np.ceil((mean_occ + 5.0 * np.sqrt(mean_occ) + 8.0) / 8.0)) * 8, 8)
    if capacity is None:
        # neighbors within r_list for a homogeneous fluid + 50% headroom
        # (unminimized lattice starts peak well above the bulk mean;
        # overflow poisons to NaN rather than truncating)
        density = n / float(np.prod(L0))
        mean_nbrs = density * 4.0 / 3.0 * np.pi * r_list**3
        capacity = int(np.ceil((mean_nbrs * 1.5 + 16.0) / 128.0)) * 128
    K = int(capacity)
    nbr = jnp.asarray(_neighbor_table(ncells))
    ncells_j = jnp.asarray(ncells.astype(np.float64))
    strides = jnp.asarray(
        [int(ncells[1] * ncells[2]), int(ncells[2]), 1], jnp.int32
    )
    n_chunks = (n + ROW_CHUNK - 1) // ROW_CHUNK
    npad_rows = n_chunks * ROW_CHUNK
    ghost = n
    ann = 1.0 if annihilate_sterics else 0.0
    r_list2 = r_list * r_list
    half_skin2 = (0.5 * skin) ** 2

    # static per-atom features with a zeroed ghost row at index n (f64
    # numpy; cast to the positions dtype at use so x64 golden-parity runs
    # keep full precision against the f64 exclusion subtraction)
    def _padded(a):
        out = np.zeros(n + 1, np.float64)
        out[:n] = np.asarray(a)[:n]
        return out

    qs_np = _padded(feats.q_std)
    qa_np = _padded(feats.q_alch)
    sig_np = _padded(feats.sigma)
    eps_np = _padded(feats.epsilon)
    af_np = _padded(feats.alch)

    def _cell_ids(xw, L):
        frac = xw / L
        ci = jnp.clip(
            jnp.floor(frac * ncells_j).astype(jnp.int32),
            0,
            jnp.asarray(ncells - 1, jnp.int32),
        )
        return ci @ strides

    def build(x, box):
        """Construct the neighbor list at positions x. Returns a dict pytree
        {idx (N_pad, K) int32, ref_x (N, 3), invalid ()bool}."""
        dtype = jnp.float32
        xf = x.astype(dtype)
        L = jnp.diagonal(box).astype(dtype)
        xw = xf - L * jnp.floor(xf / L)
        cid = _cell_ids(xw, L)
        # bin into (nc_tot+1, cap) id buffers (ghost-padded)
        counts = jax.ops.segment_sum(
            jnp.ones_like(cid, jnp.int32), cid, num_segments=nc_tot
        )
        offsets = jnp.concatenate(
            [jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]]
        )
        order = jnp.argsort(cid).astype(jnp.int32)
        sorted_cid = cid[order]
        rank = (
            jnp.arange(n, dtype=jnp.int32) - offsets[sorted_cid]
        ).astype(jnp.int32)
        slot = jnp.minimum(rank, cap - 1)
        cell_over = counts.max() > cap
        buf = jnp.full(((nc_tot + 1) * cap,), ghost, jnp.int32)
        buf = buf.at[sorted_cid * cap + slot].set(order)
        buf = buf.reshape(nc_tot + 1, cap)

        xpad = jnp.concatenate([xf, jnp.full((1, 3), 1e3, dtype)])
        cid_pad = jnp.concatenate([cid, jnp.zeros((1,), cid.dtype)])
        row_gid_pad = jnp.arange(npad_rows, dtype=jnp.int32)

        def chunk(carry, i0):
            over = carry
            rows = jax.lax.dynamic_slice(row_gid_pad, (i0,), (ROW_CHUNK,))
            rows_c = jnp.minimum(rows, ghost)
            xi = xpad[rows_c]  # (C, 3)
            cand_cells = nbr[cid_pad[rows_c]]  # (C, 27)
            cand = buf[cand_cells].reshape(ROW_CHUNK, 27 * cap)  # (C, 27*cap)
            xj = xpad[cand]  # (C, 27*cap, 3)
            dr = xi[:, None, :] - xj
            dr = dr - L * jnp.round(dr / L)
            r2 = jnp.sum(dr * dr, -1)
            hit = (r2 < r_list2) & (cand != rows_c[:, None]) & (cand < n)
            over = over | (jnp.sum(hit, axis=1).max() > K)
            # compact hits to K slots: k smallest r2 (ties fine — overflow
            # poisons before truncation can ever drop a real neighbor)
            score = jnp.where(hit, -r2, -jnp.inf)
            _, top = jax.lax.top_k(score, K)  # (C, K)
            gid = jnp.take_along_axis(cand, top, axis=1)
            keep = jnp.take_along_axis(hit, top, axis=1)
            gid = jnp.where(keep, gid, ghost)
            return over, gid

        over, idx = jax.lax.scan(
            chunk, cell_over, jnp.arange(n_chunks) * ROW_CHUNK
        )
        invalid = over | jnp.any(L / ncells_j < r_list)
        return {
            "idx": idx.reshape(npad_rows, K),
            "ref_x": xf,
            "invalid": invalid,
        }

    def apply_nlist(nlist, x, box, lam_s, f_na, f_aa):
        dtype = x.dtype
        L = jnp.diagonal(box).astype(dtype)
        idx = nlist["idx"]
        # staleness guard: list is valid while nobody moved skin/2
        d = x - nlist["ref_x"].astype(dtype)
        d = d - L * jnp.round(d / L)
        stale = jnp.max(jnp.sum(d * d, -1)) > half_skin2
        invalid = nlist["invalid"] | jax.lax.stop_gradient(stale)

        xpad = jnp.concatenate([x.astype(dtype), jnp.full((1, 3), 1e3, dtype)])
        qs_p = jnp.asarray(qs_np, dtype)
        qa_p = jnp.asarray(qa_np, dtype)
        sig_p = jnp.asarray(sig_np, dtype)
        eps_p = jnp.asarray(eps_np, dtype)
        af_p = jnp.asarray(af_np, dtype)

        def chunk(carry, i0):
            e_acc = carry
            rows = jax.lax.dynamic_slice(
                jnp.arange(npad_rows, dtype=jnp.int32), (i0,), (ROW_CHUNK,)
            )
            rows_c = jnp.minimum(rows, ghost)
            gid = jax.lax.dynamic_slice(idx, (i0, 0), (ROW_CHUNK, K))
            xi = xpad[rows_c][:, None, :]
            xj = xpad[gid]
            dr = xi - xj
            dr = dr - L * jnp.round(dr / L)
            r2 = jnp.sum(dr * dr, -1)
            valid = (gid < n) & (rows < n)[:, None]
            if method in ("PME", "CutoffPeriodic", "CutoffNonPeriodic"):
                valid = valid & (r2 < cutoff * cutoff)
            r2 = jnp.maximum(r2, 1e-6)
            ai = af_p[rows_c][:, None]
            aj = af_p[gid]
            aa = ai * aj
            scale_ster = ai + aj - 2.0 * aa + ann * aa
            e, g = pair_energy_force(
                r2,
                0.5 * (sig_p[rows_c][:, None] + sig_p[gid]),
                jnp.sqrt(eps_p[rows_c][:, None] * eps_p[gid]),
                qs_p[rows_c][:, None] * qs_p[gid],
                qs_p[rows_c][:, None] * qa_p[gid] + qa_p[rows_c][:, None] * qs_p[gid],
                qa_p[rows_c][:, None] * qa_p[gid],
                scale_ster,
                lam_sterics=lam_s, f_na=f_na, f_aa=f_aa, method=method,
                alpha_ewald=alpha_ewald, k_rf=k_rf, c_rf=c_rf,
                softcore_alpha=softcore_alpha,
                switch_distance=switch_distance, cutoff=cutoff,
                alch_coulomb=alch_coulomb,
            )
            e = jnp.where(valid, e, 0.0)
            g = jnp.where(valid, g, 0.0)
            # symmetric list: every pair appears in both rows
            e_acc = e_acc + 0.5 * jnp.sum(e)
            f_i = -jnp.einsum("ck,ckd->cd", g, dr)
            return e_acc, f_i

        e_total, f_chunks = jax.lax.scan(
            chunk, jnp.zeros((), dtype), jnp.arange(n_chunks) * ROW_CHUNK
        )
        f = f_chunks.reshape(npad_rows, 3)[:n]
        # poison BOTH outputs: the driver's amortized MD path consumes only
        # forces (energies are discarded per-step), so a clean-force return
        # on a stale/overflowed list would be silently wrong physics — NaN
        # forces propagate into positions and trip the MD rollback instead
        poison = jnp.where(invalid, jnp.nan, 0.0)
        e_total = e_total + poison
        f = f + poison
        return e_total, f

    def _pass(x, box, lam_s, f_na, f_aa):
        return apply_nlist(build(x, box), x, box, lam_s, f_na, f_aa)

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
    pair_sum.build = build
    pair_sum.apply = apply_nlist
    pair_sum.grid = tuple(int(v) for v in ncells)
    pair_sum.capacity = K
    pair_sum.skin = skin
    return pair_sum
