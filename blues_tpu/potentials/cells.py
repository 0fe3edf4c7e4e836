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

#: scan chunk: cells processed per step (bounds the materialized block;
#: 54 measured best on v5e at the 22k-atom 6x6x6 grid; env override for
#: tuning sweeps)
import os as _os

CELL_CHUNK = int(_os.environ.get("BLUES_TPU_CELL_CHUNK", "54"))


def _grid_shape(box_lengths, cutoff, shrink_margin=0.97):
    return np.maximum((np.asarray(box_lengths) * shrink_margin / cutoff).astype(int), 1)


def _perp_widths(box):
    """Perpendicular widths of a (3,3) row-vector cell along each lattice
    direction: w_d = 1 / ||inv(H)[:, d]|| — the distance between the
    fractional planes u_d = 0 and u_d = 1. Equals the diagonal for
    orthorhombic boxes. Fractional cells of width >= cutoff/w_d guarantee
    the 27-neighborhood covers every pair within the cutoff, exactly as in
    the orthorhombic case."""
    inv = np.linalg.inv(np.asarray(box, np.float64))
    return 1.0 / np.linalg.norm(inv, axis=0)


def _neighbor_table(ncells, half=False):
    """(nc_tot, K) neighbor cell ids with periodic wrap plus the (nc_tot,
    K, 3) image shifts (in box lengths) of each neighbor relative to the
    home cell. Duplicate wrapped neighbors are replaced by the empty-cell
    marker nc_tot (so tiny grids never double-count). With ``half``, only
    the self cell (always first) plus the 13 lexicographically-positive
    offsets are listed — Newton's third law halves the pair work; the
    kernel then orders self-cell pairs by atom id and scatters forces to
    both sides."""
    nx, ny, nz = (int(v) for v in ncells)
    dims = (nx, ny, nz)
    nc_tot = nx * ny * nz
    ids = np.arange(nc_tot).reshape(nx, ny, nz)
    if half:
        offsets = [(0, 0, 0)] + [
            (dx, dy, dz)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)
            if (dx, dy, dz) > (0, 0, 0)
        ]
    else:
        offsets = [
            (dx, dy, dz)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)
        ]
    K = len(offsets)
    table = np.full((nc_tot, K), nc_tot, np.int32)
    shifts = np.zeros((nc_tot, K, 3), np.int8)
    for cx in range(nx):
        for cy in range(ny):
            for cz in range(nz):
                seen = []
                for dx, dy, dz in offsets:
                    c = ids[(cx + dx) % nx, (cy + dy) % ny, (cz + dz) % nz]
                    if c not in seen:
                        k = len(seen)
                        seen.append(c)
                        # image shift: neighbor coords floor-divided by dims
                        shifts[ids[cx, cy, cz], k] = [
                            (v + d) // s for v, d, s in zip((cx, cy, cz), (dx, dy, dz), dims)
                        ]
                table[ids[cx, cy, cz], : len(seen)] = seen
    return table, shifts


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
    half_neighborhood: bool = False,
    alch_coulomb: bool = False,
):
    """Same interface as make_tiled_pair_sum: pair_sum(x, box, lam_s, f_na,
    f_aa) -> (E, F), with .energy exposing a custom-VJP scalar function.

    box0: the build-time box (static grid sizing). Requires a periodic
    method; callers should fall back to the tiled backend otherwise.
    """
    if not periodic or box0 is None:
        raise ValueError("cell-list backend requires a periodic box")
    from .triclinic import is_triclinic

    n = feats.n_atoms
    nr = feats.n_rows
    B0 = np.asarray(box0, np.float64)
    tri = is_triclinic(B0)
    # triclinic cells bin in FRACTIONAL space: grid sized from the
    # perpendicular widths so a fractional cell always covers the cutoff
    L0 = _perp_widths(B0) if tri else np.diag(B0)
    ncells = _grid_shape(L0, cutoff)
    nc_tot = int(np.prod(ncells))
    if nc_tot < 27:
        raise ValueError(
            f"grid {tuple(ncells)} too small for a cell list; use 'tiled'"
        )
    if tri and int(ncells.min()) < 3:
        raise ValueError(
            f"triclinic cell grid {tuple(ncells)} needs >= 3 cells per "
            "dimension (the lattice-shift minimum image aliases otherwise); "
            "use the dense backend for this box/cutoff"
        )
    # Newton's third law option: visit each pair once (self cell + 13
    # positive offsets) and scatter forces to both sides. Requires every
    # atom to be a row (no frozen compaction) and >= 3 cells per dim (else
    # wrapped offsets alias). Measured on v5e at 22k atoms it LOSES to the
    # both-sides sweep (15-17 ms vs ~10 ms): the column-force reduction +
    # second scatter cost more than the halved pair math saves in XLA. Kept
    # (and covered by the f64 agreement tests) as the basis for a future
    # Pallas neighbor kernel, where the reduction stays in VMEM.
    half = half_neighborhood and nr == n and int(ncells.min()) >= 3
    mean_all = n / nc_tot
    # occupancy headroom: mean + 5 sqrt(mean) + 8. Equilibrium density
    # fluctuations of condensed systems are much smaller (near-
    # incompressible), but unminimized lattice starts with solute holes
    # measure up to 1.55x the mean per cell; overflow poisons to NaN
    # rather than dropping pairs
    cap_col = _round8(mean_all + 5.0 * np.sqrt(mean_all) + 8.0)
    # active rows can cluster spatially (freeze_radius binding sites), but a
    # cell never holds more rows than atoms — bound by cap_col and by nr
    cap_row = min(cap_col, _round8(nr)) if nr < n else cap_col
    n_chunks = (nc_tot + CELL_CHUNK - 1) // CELL_CHUNK
    nc_pad = n_chunks * CELL_CHUNK
    # neighbor table padded to the chunked cell count; pad rows point at the
    # always-empty marker cell nc_tot
    n_nbr = 14 if half else 27
    table, shifts = _neighbor_table(ncells, half=half)
    nbr_np = np.full((nc_pad, n_nbr), nc_tot, np.int32)
    nbr_np[:nc_tot] = table
    shift_np = np.zeros((nc_pad, n_nbr, 3), np.float32)
    shift_np[:nc_tot] = shifts
    nbr = jnp.asarray(nbr_np)
    # static image shifts make the minimum image a fused multiply-add
    # instead of a round + divide per pair and dimension — positions are
    # stored box-wrapped, and each (cell, neighbor) block carries its wrap
    # count in box lengths. Only exact for >= 3 cells per dimension (else a
    # wrapped offset aliases two images); smaller grids keep the round path.
    use_shifts = bool(ncells.min() >= 3)
    shift_tab = jnp.asarray(shift_np)

    ncells_j = jnp.asarray(ncells.astype(np.float64))
    strides = jnp.asarray(
        [int(ncells[1] * ncells[2]), int(ncells[2]), 1], jnp.int32
    )
    row_idx = jnp.asarray(feats.row_idx[: max(nr, 1)][:nr])
    ann = 1.0 if annihilate_sterics else 0.0
    ghost = n  # index of the parked ghost atom (q = eps = 0)

    def _bin(cid, count_n, capacity):
        """(n_entries,) cell ids -> (order, sorted_cid, slot, overflow):
        the scatter coordinates that place entry order[k] into
        (cell sorted_cid[k], slot[k]) of a (nc_pad+1, capacity) buffer."""
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
        slot = jnp.minimum(rank, capacity - 1)
        overflow = counts.max() > capacity
        return order, sorted_cid, slot, overflow

    def _cell_ids(xw, L):
        frac = xw / L
        ci = jnp.clip(
            jnp.floor(frac * ncells_j).astype(jnp.int32),
            0,
            jnp.asarray(ncells - 1, jnp.int32),
        )
        return ci @ strides

    # per-atom channel layout of the packed cell buffers
    # [0:3] position, [3] q_std, [4] q_alch, [5] sigma, [6] epsilon,
    # [7] alch flag, [8] in_rows, [9] global atom id (exact in f32 for
    # n < 2^24)
    C = 10

    def _pack(entries_global, cid_entries, capacity, x, chan):
        """Scatter per-entry channel rows into a ghost-initialized
        (nc_pad+1, capacity, C) buffer — one contiguous scatter, so the
        per-chunk neighbor reads below are contiguous block gathers instead
        of element gathers (the XLA-gather cost is what made the naive
        formulation lose to the O(N^2) kernel on TPU)."""
        dtype = x.dtype
        order, sorted_cid, slot, overflow = _bin(cid_entries, len(entries_global), capacity)
        ghost_row = jnp.concatenate(
            [jnp.full(3, 1e3, dtype), jnp.zeros(C - 4, dtype), jnp.full(1, ghost, dtype)]
        )
        buf = jnp.broadcast_to(ghost_row, ((nc_pad + 1) * capacity, C))
        vals = chan[jnp.asarray(entries_global)[order]]
        buf = buf.at[sorted_cid * capacity + slot].set(vals)
        return buf.reshape(nc_pad + 1, capacity, C), overflow

    def _pass(x, box, lam_s, f_na, f_aa):
        dtype = x.dtype
        L = jnp.diagonal(box).astype(dtype)
        if tri:
            # fractional-space binning: u in [0,1)^3, positions re-mapped
            # into the primary cell of the (runtime) lattice
            boxd = jnp.asarray(box, dtype)
            u = x @ jnp.linalg.inv(boxd)
            u = u - jnp.floor(u)
            xw = u @ boxd
        else:
            xw = x - L * jnp.floor(x / L)
        # positions travel box-wrapped so the static shift table gives the
        # exact minimum image without a per-pair round/divide
        chan = jnp.concatenate(
            [
                xw if use_shifts else x,
                jnp.asarray(feats.q_std[:n], dtype)[:, None],
                jnp.asarray(feats.q_alch[:n], dtype)[:, None],
                jnp.asarray(feats.sigma[:n], dtype)[:, None],
                jnp.asarray(feats.epsilon[:n], dtype)[:, None],
                jnp.asarray(feats.alch[:n], dtype)[:, None],
                jnp.asarray(feats.in_rows[:n], dtype)[:, None],
                jnp.arange(n, dtype=dtype)[:, None],
            ],
            axis=1,
        )  # (n, C)

        if tri:
            ci = jnp.clip(
                jnp.floor(u * ncells_j.astype(dtype)).astype(jnp.int32),
                0,
                jnp.asarray(ncells - 1, jnp.int32),
            )
            cid = ci @ strides
        else:
            cid = _cell_ids(xw, L)
        all_ids = jnp.arange(n)
        cols_buf, over_c = _pack(all_ids, cid, cap_col, x, chan)
        if nr == n:
            rows_buf, over_r = cols_buf, over_c
            rcap = cap_col
        else:
            rows_buf, over_r = _pack(row_idx, cid[row_idx], cap_row, x, chan)
            rcap = cap_row
        # grid validity: cell edge must still cover the cutoff (NPT shrink)
        if tri:
            inv_rt = jnp.linalg.inv(jnp.asarray(box, dtype))
            widths = 1.0 / jnp.sqrt(jnp.sum(inv_rt * inv_rt, axis=0))
            invalid = over_c | over_r | jnp.any(widths / ncells_j < cutoff)
        else:
            invalid = over_c | over_r | jnp.any(L / ncells_j < cutoff)

        def chunk(carry, c0):
            e_acc, f_acc = carry
            rows = jax.lax.dynamic_slice(
                rows_buf, (c0, 0, 0), (CELL_CHUNK, rcap, C)
            )  # (B, R, C)
            nbr_c = jax.lax.dynamic_slice(nbr, (c0, 0), (CELL_CHUNK, n_nbr))
            cols4 = cols_buf[nbr_c]  # (B, K, Cc, C)
            if use_shifts:
                # apply the per-(cell, neighbor) image shift to the column
                # positions BEFORE flattening: the per-pair minimum image
                # then needs no round/divide at all. Triclinic: the shift
                # counts are LATTICE counts -> shift vector = counts @ H
                sh = jax.lax.dynamic_slice(
                    shift_tab, (c0, 0, 0), (CELL_CHUNK, n_nbr, 3)
                ).astype(dtype)
                sh_vec = (
                    jnp.einsum("bkd,de->bke", sh, jnp.asarray(box, dtype))
                    if tri
                    else sh * L
                )
                cols4 = cols4.at[:, :, :, 0:3].add(sh_vec[:, :, None, :])
            cols = cols4.reshape(CELL_CHUNK, n_nbr * cap_col, C)

            xi = rows[:, :, None, 0:3]
            xj = cols[:, None, :, 0:3]
            dr = xi - xj
            if not use_shifts:
                dr = dr - L * jnp.round(dr / L)
            r2 = jnp.sum(dr * dr, -1)
            gid_i = rows[:, :, None, 9]
            gid_j = cols[:, None, :, 9]
            valid = (
                (gid_i != gid_j)
                & (gid_i < n)
                & (gid_j < n)
                & (r2 < cutoff * cutoff)
            )
            if half:
                # self cell occupies the first cap_col column slots: order
                # those pairs by atom id so each intra-cell pair counts once
                self_block = (
                    jnp.arange(n_nbr * cap_col) < cap_col
                )[None, None, :]
                valid = valid & (~self_block | (gid_i < gid_j))
            r2 = jnp.maximum(r2, 1e-6)
            ai = rows[:, :, None, 7]
            aj = cols[:, None, :, 7]
            aa = ai * aj
            scale_ster = ai + aj - 2.0 * aa + ann * aa
            e, g = pair_energy_force(
                r2,
                0.5 * (rows[:, :, None, 5] + cols[:, None, :, 5]),
                jnp.sqrt(rows[:, :, None, 6] * cols[:, None, :, 6]),
                rows[:, :, None, 3] * cols[:, None, :, 3],
                rows[:, :, None, 3] * cols[:, None, :, 4]
                + rows[:, :, None, 4] * cols[:, None, :, 3],
                rows[:, :, None, 4] * cols[:, None, :, 4],
                scale_ster,
                lam_sterics=lam_s, f_na=f_na, f_aa=f_aa, method=method,
                alpha_ewald=alpha_ewald, k_rf=k_rf, c_rf=c_rf,
                softcore_alpha=softcore_alpha,
                switch_distance=switch_distance, cutoff=cutoff,
                alch_coulomb=alch_coulomb,
            )
            e = jnp.where(valid, e, 0.0)
            g = jnp.where(valid, g, 0.0)
            rid = jnp.minimum(rows[:, :, 9].astype(jnp.int32), n)
            if half:
                # every pair counted once: full energy, forces to both sides
                e_acc = e_acc + jnp.sum(e)
                f_rows = -jnp.einsum("brc,brcd->brd", g, dr)
                f_cols = jnp.einsum("brc,brcd->bcd", g, dr)  # (B, C, 3)
                cid_j = jnp.minimum(cols[:, :, 9].astype(jnp.int32), n)
                f_acc = f_acc.at[rid.reshape(-1)].add(
                    f_rows.reshape(-1, 3), mode="drop"
                )
                f_acc = f_acc.at[cid_j.reshape(-1)].add(
                    f_cols.reshape(-1, 3), mode="drop"
                )
            else:
                # both-sides visit: row-row pairs weigh 0.5, row-frozen 1.0
                wcol = 1.0 - 0.5 * rows[:, :, None, 8] * cols[:, None, :, 8]
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
        # poison BOTH outputs on overflow / invalid grid: the MD driver
        # consumes only forces (energies are discarded per step), so a
        # clean-force return on a truncated bin buffer would be silently
        # wrong physics that never trips the rollback (same invariant as
        # potentials/verlet.py)
        poison = jnp.where(invalid, jnp.nan, 0.0)
        return e_total + poison, f[:n] + poison

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
