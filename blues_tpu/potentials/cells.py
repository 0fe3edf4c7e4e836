"""Cell-list nonbonded backend: O(N) neighbor culling inside jit.

Replaces the O(N^2) tile sweep for large periodic systems — the TPU-native
equivalent of the cell lists inside OpenMM's NonbondedForce direct-space
kernels (SURVEY.md 2.3), rebuilt for XLA's static-shape model:

  * the simulation box is partitioned into a static grid of cells with edge
    >= cutoff (grid shape fixed at trace time from the build box, with a 3%
    NPT shrink margin);
  * every evaluation, atoms are binned into (n_cells, capacity) index
    buffers with a sort + scatter (O(N log N), negligible next to the pair
    math); capacities are static, sized from the build-time density with
    headroom — if a cell ever overflows, or the box shrinks below the grid's
    validity, the energy is poisoned to NaN, which the driver's
    NaN-trapping semantics convert into a rejected iteration
    (SURVEY.md 5.2) instead of silently wrong physics;
  * each cell's atoms interact with the 27-cell neighborhood via gathered
    (capacity, 27*capacity) blocks — identical per-pair math to the
    dense/tiled/Pallas backends (potentials.pairs), scanned over cell
    chunks to bound the materialized intermediates.

Active-row compaction (frozen atoms) composes: rows are binned from the
mobile-or-alchemical subset only, columns from all atoms; row-row pairs
weigh 0.5, row-frozen 1.0 (see PairFeatures in tiled.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .pairs import pair_energy_force
from .tiled import PairFeatures

#: scan chunk: cells processed per step (bounds the materialized block)
CELL_CHUNK = 32


def _grid_shape(box_lengths, cutoff, shrink_margin=0.97):
    return np.maximum((np.asarray(box_lengths) * shrink_margin / cutoff).astype(int), 1)


def _neighbor_table(ncells):
    """(nc_tot, 27) neighbor cell ids with periodic wrap; duplicate wrapped
    neighbors are replaced by the empty-cell marker nc_tot (so tiny grids
    never double-count)."""
    nx, ny, nz = (int(v) for v in ncells)
    nc_tot = nx * ny * nz
    ids = np.arange(nc_tot).reshape(nx, ny, nz)
    table = np.full((nc_tot, 27), nc_tot, np.int32)
    for cx in range(nx):
        for cy in range(ny):
            for cz in range(nz):
                seen = []
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        for dz in (-1, 0, 1):
                            c = ids[(cx + dx) % nx, (cy + dy) % ny, (cz + dz) % nz]
                            if c not in seen:
                                seen.append(c)
                table[ids[cx, cy, cz], : len(seen)] = seen
    return table


def _round8(v, minimum=8):
    return max(int(np.ceil(v / 8.0)) * 8, minimum)


def make_cell_pair_sum(
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
    capacity_factor: float = 1.6,
):
    """Same interface as make_tiled_pair_sum: pair_sum(x, box, lam_s, f_na,
    f_aa) -> (E, F), with .energy exposing a custom-VJP scalar function.

    box0: the build-time box (static grid sizing). Requires a periodic
    method; callers should fall back to the tiled backend otherwise.
    """
    if not periodic or box0 is None:
        raise ValueError("cell-list backend requires a periodic box")
    n = feats.n_atoms
    nr = feats.n_rows
    L0 = np.diag(np.asarray(box0, np.float64))
    ncells = _grid_shape(L0, cutoff)
    nc_tot = int(np.prod(ncells))
    if nc_tot < 27:
        raise ValueError(
            f"grid {tuple(ncells)} too small for a cell list; use 'tiled'"
        )
    mean_all = n / nc_tot
    # occupancy headroom: mean + 6 sqrt(mean) covers equilibrium density
    # fluctuations of condensed systems with large margin; overflow poisons
    # to NaN rather than dropping pairs
    cap_col = _round8(mean_all + 6.0 * np.sqrt(mean_all) + 8.0)
    # active rows can cluster spatially (freeze_radius binding sites), but a
    # cell never holds more rows than atoms — bound by cap_col and by nr
    cap_row = min(cap_col, _round8(nr)) if nr < n else cap_col
    n_chunks = (nc_tot + CELL_CHUNK - 1) // CELL_CHUNK
    nc_pad = n_chunks * CELL_CHUNK
    # neighbor table padded to the chunked cell count; pad rows point at the
    # always-empty marker cell nc_tot
    nbr_np = np.full((nc_pad, 27), nc_tot, np.int32)
    nbr_np[:nc_tot] = _neighbor_table(ncells)
    nbr = jnp.asarray(nbr_np)

    ncells_j = jnp.asarray(ncells.astype(np.float64))
    strides = jnp.asarray(
        [int(ncells[1] * ncells[2]), int(ncells[2]), 1], jnp.int32
    )
    row_idx = jnp.asarray(feats.row_idx[: max(nr, 1)][:nr])
    ann = 1.0 if annihilate_sterics else 0.0
    ghost = n  # index of the parked ghost atom (q = eps = 0)

    def _bin(cid, count_n, capacity):
        """(n_entries,) cell ids -> (nc_pad+1, capacity) atom-index buffer
        (ghost-padded; final row = the always-empty marker cell)."""
        counts = jax.ops.segment_sum(
            jnp.ones_like(cid, jnp.int32), cid, num_segments=nc_tot
        )
        offsets = jnp.concatenate(
            [jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]]
        )
        order = jnp.argsort(cid).astype(jnp.int32)
        sorted_cid = cid[order]
        rank = (jnp.arange(count_n, dtype=jnp.int32) - offsets[sorted_cid]).astype(
            jnp.int32
        )
        buf = jnp.full((nc_pad + 1, capacity), ghost, jnp.int32)
        buf = buf.at[sorted_cid, jnp.minimum(rank, capacity - 1)].set(order)
        overflow = counts.max() > capacity
        return buf, overflow

    def _cell_ids(xw, L):
        frac = xw / L
        ci = jnp.clip(
            jnp.floor(frac * ncells_j).astype(jnp.int32),
            0,
            jnp.asarray(ncells - 1, jnp.int32),
        )
        return ci @ strides

    def _pass(x, box, lam_s, f_na, f_aa):
        dtype = x.dtype
        qs = jnp.asarray(feats.q_std, dtype)
        qa = jnp.asarray(feats.q_alch, dtype)
        sig = jnp.asarray(feats.sigma, dtype)
        eps = jnp.asarray(feats.epsilon, dtype)
        af = jnp.asarray(feats.alch, dtype)
        inr = jnp.asarray(feats.in_rows, dtype)
        L = jnp.diagonal(box).astype(dtype)
        # park the ghost far outside every cutoff
        xpad = jnp.concatenate([x, jnp.full((1, 3), 1e3, dtype)], axis=0)

        xw = x - L * jnp.floor(x / L)
        cid = _cell_ids(xw, L)
        colbuf, over_c = _bin(cid, n, cap_col)
        if nr == n:
            rowbuf, over_r = colbuf, over_c
            row_gid_buf = rowbuf
        else:
            rowbuf, over_r = _bin(cid[row_idx], nr, cap_row)
            # rowbuf holds indices into row_idx; map to global atom ids
            row_gid_buf = jnp.where(
                rowbuf == ghost, ghost, jnp.asarray(
                    np.concatenate([np.asarray(feats.row_idx[:nr]), [0]])
                )[jnp.minimum(rowbuf, nr)],
            )
        # grid validity: cell edge must still cover the cutoff (NPT shrink)
        invalid = over_c | over_r | jnp.any(L / ncells_j < cutoff)

        cols_all = colbuf[nbr]  # (nc_pad, 27, cap_col) via neighbor gather
        cols_all = cols_all.reshape(nc_pad, 27 * cap_col)
        rows_all = row_gid_buf[:nc_pad]

        def chunk(carry, c0):
            e_acc, f_acc = carry
            rid = jax.lax.dynamic_slice(
                rows_all, (c0, 0), (CELL_CHUNK, rows_all.shape[1])
            )  # (B, R) global atom ids (ghost-padded)
            cidx = jax.lax.dynamic_slice(
                cols_all, (c0, 0), (CELL_CHUNK, cols_all.shape[1])
            )  # (B, C)
            xi = xpad[rid]  # (B, R, 3)
            xj = xpad[cidx]  # (B, C, 3)
            dr = xi[:, :, None, :] - xj[:, None, :, :]
            dr = dr - L * jnp.round(dr / L)
            r2 = jnp.sum(dr * dr, -1)
            valid = (
                (rid[:, :, None] != cidx[:, None, :])
                & (rid[:, :, None] < n)
                & (cidx[:, None, :] < n)
                & (r2 < cutoff * cutoff)
            )
            r2 = jnp.maximum(r2, 1e-6)
            fi_q, fj_q = qs[rid][:, :, None], qs[cidx][:, None, :]
            fi_a, fj_a = qa[rid][:, :, None], qa[cidx][:, None, :]
            ai, aj = af[rid][:, :, None], af[cidx][:, None, :]
            aa = ai * aj
            scale_ster = ai + aj - 2.0 * aa + ann * aa
            sij = 0.5 * (sig[rid][:, :, None] + sig[cidx][:, None, :])
            eij = jnp.sqrt(eps[rid][:, :, None] * eps[cidx][:, None, :])
            e, g = pair_energy_force(
                r2, sij, eij,
                fi_q * fj_q,
                fi_q * fj_a + fi_a * fj_q,
                fi_a * fj_a,
                scale_ster,
                lam_sterics=lam_s, f_na=f_na, f_aa=f_aa, method=method,
                alpha_ewald=alpha_ewald, k_rf=k_rf, c_rf=c_rf,
                softcore_alpha=softcore_alpha,
                switch_distance=switch_distance, cutoff=cutoff,
            )
            e = jnp.where(valid, e, 0.0)
            g = jnp.where(valid, g, 0.0)
            wcol = 1.0 - 0.5 * inr[rid][:, :, None] * inr[cidx][:, None, :]
            e_acc = e_acc + jnp.sum(wcol * e)
            f_rows = -jnp.einsum("brc,brcd->brd", g, dr)  # (B, R, 3)
            f_acc = f_acc.at[rid.reshape(-1)].add(
                f_rows.reshape(-1, 3), mode="drop"
            )
            return (e_acc, f_acc), None

        f0 = jnp.zeros((n + 1, 3), dtype)
        (e_total, f), _ = jax.lax.scan(
            chunk,
            (jnp.zeros((), dtype), f0),
            jnp.arange(n_chunks) * CELL_CHUNK,
        )
        # poison on overflow / invalid grid -> NaN -> driver rejects
        e_total = e_total + jnp.where(invalid, jnp.nan, 0.0)
        return e_total, f[:n]

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
    pair_sum.grid = tuple(int(v) for v in ncells)
    pair_sum.capacities = (cap_row if nr != n else cap_col, cap_col)
    return pair_sum
