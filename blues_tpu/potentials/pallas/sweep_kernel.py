"""VMEM-accumulator Pallas kernel for the culled frozen pair sweep.

The round-3 on-chip decomposition (docs/perf_decomposition_r256.json) showed
the frozen production protocol spending ~70% of its micro-step in the tiled
XLA kernel's HBM-materialized pair-slot buffers: at R=256 replicas the
(256, 128 rows, 6528 cols) f32 intermediates are ~855 MB EACH, so the step
is HBM-bandwidth-bound at ~0.5% MFU. This kernel keeps every (rows x cols)
pair tile in VMEM and accumulates energy and forces in-register — the pair
intermediates never exist in HBM, cutting ~5 GB/step-batch of traffic to
the O(50 MB) of row/column coordinate I/O.

One kernel factory serves the three sweeps of the lambda-split NCMC path
(potentials/nonbonded.py):

  * the MAIN sweep: all mobile rows x culled columns at lambda (full path);
  * the E0 sweep:   non-alchemical mobile rows x non-alchemical columns
                    (lambda-independent part, cached across micro-steps);
  * the EA sweep:   alchemical rows x non-alchemical columns with COLUMN
                    reaction forces (the tiny per-lambda part) — rows ride
                    the sublane dimension (TR=16 for a 15-atom ligand), so
                    the alchemical block costs ~1/8 of a full sweep instead
                    of padding 15 rows to 128.

Correctness features carried over from the tiled fast path
(potentials/tiled.py): build-time exclusion masking (excluded bonded pairs
are never computed, removing the f32 compute-then-subtract cancellation),
compile-time constant column positions for frozen atoms (only the few
mobile columns gather from the runtime array), and optional skip of the
per-pair minimum-image wrap under the _no_image_geometry extent proof.

vmap safety: jax.vmap of pallas_call PREPENDS a grid dimension, which
shifts pl.program_id indices — so "first column tile" detection (the
output-accumulator zero-init) reads a flag baked into slot 7 of the column
feature array (1.0 only in the first tile's columns) instead of any
program_id. Replica batching therefore costs one extra grid dimension and
nothing else; static feature/mask operands stay unbatched and shared.

Per-pair math is the shared potentials.pairs formulas — identical to the
dense/tiled/cells backends, which are its correctness references
(tests/test_sweep_kernel.py pins f32 agreement and vmap consistency).

Replaces the role of OpenMM's CUDA direct-space nonbonded kernels for the
reference's freeze_radius production protocol (reference:
blues/simulation.py:394-480, examples/rotmove_cuda.yml:42-45).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..pairs import pair_energy_force

# feature-row indices (shared layout with pallas/pair_kernel.py); the row
# array reuses slots 5/6 for global id/validity and keeps its own in_rows
# flag in slot 7 (the "is a row of THIS kernel" membership — each sweep
# instance decides what that means, see make_sweep_pair_sum callers)
F_QSTD, F_QALCH, F_SIG, F_EPS, F_ALCH, F_INROWS, F_CGID = 0, 1, 2, 3, 4, 5, 6
R_GID, R_VALID, R_INROWS = 5, 6, 7
#: column slot 7 = 1.0 ONLY for the first column tile: the kernel's
#: "zero-init the output accumulator" flag. Pure data (no pl.program_id),
#: so it survives jax.vmap prepending a grid dimension AND satisfies the
#: Mosaic block-shape rules a (1,1)-blocked SMEM marker operand violates.
F_FIRST = 7

DEFAULT_COL_TILE = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _morton_order(p):
    """Order 3-D points by interleaved-bit (Morton) code — spatially
    adjacent points land in the same chunk."""
    p = np.asarray(p, np.float64)
    q = ((p - p.min(0)) / max(float(np.ptp(p)), 1e-9) * 1023).astype(np.int64)
    code = np.zeros(len(p), np.int64)
    for b in range(10):
        for d in range(3):
            code |= ((q[:, d] >> b) & 1) << (3 * b + d)
    return np.argsort(code, kind="stable")


def build_row_groups(
    *,
    rows,
    centers,
    radii,
    cols,
    ref_positions,
    box_lengths,
    cutoff,
    group_size,
    excl_mask=None,
):
    """Partition rows into Morton-ordered groups of ``group_size`` and give
    each group the columns inside ITS rows' permanent reach balls.

    Soundness is inherited from the culling guard's own bounds: row i stays
    inside ball(center_i, r_i) forever (poisoned otherwise), a mobile
    column j inside ball(center_j, r_j), a frozen column at its reference
    position — so any runtime pair within ``cutoff`` satisfies
    |c_i - c_j|_minimage <= r_i + r_j + cutoff, which is exactly the
    (symmetric) inclusion test. Build-time-masked exclusion pairs are
    force-included so the no-min-image rest-term bookkeeping sees the same
    masked pair set as the ungrouped layout.

    Returns a list of (row_local_idx, col_local_idx) for
    make_sweep_pair_sum(groups=...).
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    centers = np.asarray(centers, np.float64)
    radii = np.asarray(radii, np.float64)
    x0 = np.asarray(ref_positions, np.float64)
    rpos = np.full(x0.shape[0], -1, np.int64)
    rpos[rows] = np.arange(len(rows))
    k = rpos[cols]
    ccent = np.where((k >= 0)[:, None], centers[np.maximum(k, 0)], x0[cols])
    crad = np.where(k >= 0, radii[np.maximum(k, 0)], 0.0)
    em = None if excl_mask is None else np.asarray(excl_mask, bool)
    order = _morton_order(centers)
    groups = []
    for lo in range(0, len(order), int(group_size)):
        rsel = order[lo : lo + int(group_size)]
        d = centers[rsel][:, None, :] - ccent[None, :, :]
        if box_lengths is not None:
            L = np.asarray(box_lengths, np.float64)
            d -= L * np.round(d / L)
        reach = (d * d).sum(-1) <= (radii[rsel][:, None] + crad[None, :] + cutoff) ** 2
        csel = reach.any(0)
        if em is not None:
            csel |= em[rsel].any(0)
        groups.append((rsel, np.where(csel)[0]))
    return groups


def _row_tile(nr: int) -> int:
    """Sublane row-tile: small row counts (the alchemical block) ride the
    sublane dimension instead of padding to 128 lanes."""
    if nr > 64:
        return 128
    t = 8
    while t < nr:
        t *= 2
    return t


def _make_kernel(
    *,
    method,
    cutoff,
    alpha_ewald,
    k_rf,
    c_rf,
    ann,
    softcore_alpha,
    periodic,
    skip_min_image,
    switch_distance,
    alch_coulomb,
    tr,
    tc,
    has_excl,
    col_forces,
):
    use_cutoff = method in ("PME", "CutoffPeriodic", "CutoffNonPeriodic")

    def kernel(*refs):
        if has_excl:
            params_ref, xr_ref, xc_ref, fr_ref, fc_ref, excl_ref = refs[:6]
            out_refs = refs[6:]
        else:
            params_ref, xr_ref, xc_ref, fr_ref, fc_ref = refs[:5]
            out_refs = refs[5:]
        out_ref = out_refs[0]
        # first-column-tile flag from the feature data (vmap/Mosaic-safe);
        # baked on every group's tile 0 so the accumulator is always
        # initialized, even for a (degenerate) group with no real columns
        is_first = fc_ref[F_FIRST, 0] > 0

        @pl.when(is_first)
        def _():
            out_ref[:, :] = jnp.zeros((tr, 8), jnp.float32)

        if col_forces:
            out_refs[1][:, :] = jnp.zeros((8, tc), jnp.float32)

        # grouped layouts pad every group's column storage to the max group
        # tile count; a tile whose FIRST column id is -1 is pure padding
        # (real columns pack from the front) — skip its pair math entirely
        has_cols = fc_ref[F_CGID, 0] >= 0

        @pl.when(has_cols)
        def _():
            lam_s = params_ref[0, 0]
            f_na = params_ref[0, 1]
            f_aa = params_ref[0, 2]

            dxs = []
            r2 = jnp.zeros((tr, tc), jnp.float32)
            for d in range(3):
                xi = xr_ref[:, d][:, None]
                xj = xc_ref[d, :][None, :]
                dx = xi - xj
                if periodic and not skip_min_image:
                    L = params_ref[0, 3 + d]
                    dx = dx - L * jnp.round(dx / L)
                dxs.append(dx)
                r2 = r2 + dx * dx

            gid_i = fr_ref[:, R_GID][:, None]
            cj = fc_ref[F_CGID, :][None, :]
            valid = (gid_i != cj) & (fr_ref[:, R_VALID][:, None] > 0) & (cj >= 0)
            if has_excl:
                valid = valid & (excl_ref[:, :] == 0)
            if use_cutoff:
                valid = valid & (r2 < cutoff * cutoff)
            r2 = jnp.maximum(r2, 1e-6)

            qs_i = fr_ref[:, F_QSTD][:, None]
            qs_j = fc_ref[F_QSTD, :][None, :]
            qa_i = fr_ref[:, F_QALCH][:, None]
            qa_j = fc_ref[F_QALCH, :][None, :]
            sij = 0.5 * (fr_ref[:, F_SIG][:, None] + fc_ref[F_SIG, :][None, :])
            eij = jnp.sqrt(fr_ref[:, F_EPS][:, None] * fc_ref[F_EPS, :][None, :])
            ai = fr_ref[:, F_ALCH][:, None]
            aj = fc_ref[F_ALCH, :][None, :]
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
            # row-row pairs are visited from both sides -> energy weight 0.5
            wcol = 1.0 - 0.5 * fr_ref[:, R_INROWS][:, None] * fc_ref[F_INROWS, :][None, :]

            for d in range(3):
                out_ref[:, d] += -jnp.sum(g * dxs[d], axis=1)
            out_ref[:, 3] += jnp.sum(wcol * e, axis=1)

            if col_forces:
                outc_ref = out_refs[1]
                for d in range(3):
                    # reaction force on the column atom: F_j = +g * (x_i - x_j)
                    outc_ref[d, :] = jnp.sum(g * dxs[d], axis=0)

    return kernel


def make_sweep_pair_sum(
    *,
    row_gid,
    col_gid,
    per_atom,  # dict: q_std, q_alch, sigma, epsilon, alch, in_rows -> (n,) arrays
    n_atoms: int,
    method: str,
    cutoff: float,
    alpha_ewald: float,
    k_rf: float,
    c_rf: float,
    annihilate_sterics: bool,
    softcore_alpha: float = 0.5,
    periodic: bool = True,
    switch_distance: float = None,
    alch_coulomb: bool = False,
    excl_mask=None,  # (nr, nc) bool: True = skip this pair at build time
    col_const_positions=None,  # (nc, 3) static col positions (incl. shifts)
    col_mobile_sel=None,  # positions within col_gid to refresh at runtime
    col_mobile_gid=None,  # their global atom ids
    skip_min_image: bool = False,
    col_forces: bool = False,
    col_force_keep=None,  # col positions whose reaction forces scatter back
    col_tile: int = DEFAULT_COL_TILE,
    interpret: bool = None,
    groups=None,  # list of (row_local_idx, col_local_idx) — grouped layout
):
    """pair_sum(x, box, lam_s, f_na, f_aa) -> (E, F) over the (row_gid x
    col_gid) pair block, with .energy exposing a custom-VJP scalar whose
    pullback reuses the analytic forces (one kernel pass for E+F+grad).

    col_forces: also accumulate reaction forces on columns and scatter the
    ``col_force_keep`` subset back into F (the alchemical NA block, whose
    mobile non-alchemical columns are not rows). Requires a single row
    tile. Frozen columns' forces are computed in-register but discarded —
    frozen atoms never move (same semantics as the stop_gradient in the
    dense NA block, potentials/nonbonded.py lambda_ea).

    groups: per-row-GROUP column culling (build_row_groups). Each entry is
    (row_local_idx, col_local_idx) into row_gid/col_gid; the groups must
    partition the rows. Grid becomes (n_groups, max_group_col_tiles) with
    each group's column storage laid out contiguously — a group only pays
    pair slots for columns inside ITS rows' permanent reach balls instead
    of the union over all rows (~2x fewer slots at the production
    flagship, tools/probe_group_cull.py). Groups with fewer columns than
    the max are padded with marker tiles the kernel skips (F_CGID < 0).
    The caller must guarantee soundness: every runtime-reachable (row,
    col) pair AND every build-time-masked exclusion pair of a row must
    appear in that row's group (build_row_groups enforces both from the
    same permanent-ball bounds the culling guard poisons on)."""
    global pl, pltpu
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    rows_np = np.asarray(row_gid, np.int64)
    cols_np = np.asarray(col_gid, np.int64)
    nr, nc = len(rows_np), len(cols_np)
    tc = int(col_tile)
    grouped = groups is not None
    if grouped and col_forces:
        raise ValueError("groups and col_forces are mutually exclusive")
    em_full = None
    if excl_mask is not None:
        em_full = np.asarray(excl_mask, bool)
        if em_full.shape != (nr, nc):
            raise ValueError(f"excl_mask {em_full.shape} != ({nr}, {nc})")

    if grouped:
        seen = np.concatenate([np.asarray(g[0], np.int64) for g in groups])
        if len(seen) != nr or len(np.unique(seen)) != nr:
            raise ValueError("groups must partition the rows exactly once")
        tr = _row_tile(max(len(g[0]) for g in groups))
        n_groups = len(groups)
        nr_pad = n_groups * tr
        ncg_pad = max(_round_up(max(len(g[1]), 1), tc) for g in groups)
        n_col_tiles = ncg_pad // tc
        n_row_tiles = n_groups
        S = n_groups * ncg_pad
    else:
        tr = _row_tile(nr)
        nr_pad = _round_up(nr, tr)
        ncg_pad = _round_up(nc, tc)
        n_row_tiles = nr_pad // tr
        n_col_tiles = ncg_pad // tc
        S = ncg_pad
    if col_forces and n_row_tiles != 1:
        raise ValueError(
            "col_forces requires a single row tile (the column-force output "
            f"block is written once per column tile); got {n_row_tiles}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # static feature arrays: columns keep the (8, S) layout (atoms on
    # lanes); ROW-side arrays are (nr_pad, 8) — rows on SUBLANES — so the
    # (tr, 8) blocks stay Mosaic-legal for small grouped row tiles (the
    # lane dimension must be divisible by 128 or equal the full array dim)
    # and the per-row force/energy reductions store without a transpose.
    # Row slot s -> slot_row[s] (local row index, -1 padding); column
    # storage position p -> occ_col[p] (local col index, -1 padding).
    slot_row = np.full(nr_pad, -1, np.int64)
    occ_col = np.full(S, -1, np.int64)
    first_flag = np.zeros(S, np.float32)
    if grouped:
        for g, (rsel, csel) in enumerate(groups):
            rsel = np.asarray(rsel, np.int64)
            csel = np.asarray(csel, np.int64)
            slot_row[g * tr : g * tr + len(rsel)] = rsel
            occ_col[g * ncg_pad : g * ncg_pad + len(csel)] = csel
            first_flag[g * ncg_pad : g * ncg_pad + tc] = 1.0
    else:
        slot_row[:nr] = np.arange(nr)
        occ_col[:nc] = np.arange(nc)
        first_flag[:tc] = 1.0

    sl_live = slot_row >= 0
    oc_live = occ_col >= 0
    sl_r = np.where(sl_live, slot_row, 0)
    oc_c = np.where(oc_live, occ_col, 0)
    feat_rows = np.zeros((nr_pad, 8), np.float32)
    feat_cols = np.zeros((8, S), np.float32)
    for k, arr in (
        (F_QSTD, "q_std"), (F_QALCH, "q_alch"), (F_SIG, "sigma"),
        (F_EPS, "epsilon"), (F_ALCH, "alch"), (F_INROWS, "in_rows"),
    ):
        a = np.asarray(per_atom[arr], np.float64)
        feat_rows[:, k] = np.where(sl_live, a[rows_np[sl_r]], 0.0)
        feat_cols[k] = np.where(oc_live, a[cols_np[oc_c]], 0.0)
    feat_rows[:, R_GID] = np.where(sl_live, rows_np[sl_r].astype(np.float64), -1.0)
    feat_rows[:, R_INROWS] = np.where(
        sl_live, np.asarray(per_atom["in_rows"], np.float64)[rows_np[sl_r]], 0.0
    )
    feat_rows[:, R_VALID] = sl_live.astype(np.float32)
    feat_cols[F_CGID] = np.where(oc_live, cols_np[oc_c].astype(np.float64), -1.0)
    feat_cols[F_FIRST] = first_flag  # per-group tile-0 init flag (see doc)

    excl_f32 = None
    if em_full is not None:
        if grouped:
            # per-group block layout: storage position p holds the mask of
            # (its group's row slots) x (the column at p)
            excl_f32 = np.zeros((tr, S), np.float32)
            for g, (rsel, csel) in enumerate(groups):
                rsel = np.asarray(rsel, np.int64)
                csel = np.asarray(csel, np.int64)
                blk = em_full[np.ix_(rsel, csel)]
                excl_f32[: len(rsel), g * ncg_pad : g * ncg_pad + len(csel)] = blk
                dropped = em_full[rsel].sum() - blk.sum()
                if dropped:
                    raise ValueError(
                        f"group {g} drops {dropped} masked exclusion pairs — "
                        "its column set must include every excluded partner "
                        "(build_row_groups force-includes them)"
                    )
        else:
            excl_f32 = np.zeros((nr_pad, S), np.float32)
            excl_f32[:nr, :nc] = em_full

    col_const_np = (
        None if col_const_positions is None else np.asarray(col_const_positions, np.float64)
    )
    occ_const_np = None
    if col_const_np is not None:
        occ_const_np = np.zeros((S, 3))
        occ_const_np[oc_live] = col_const_np[occ_col[oc_live]]
    mob_sel_j = mob_gid_j = None
    if col_mobile_sel is not None and len(col_mobile_sel):
        # occurrences (storage positions) of each mobile column
        mob_set = np.zeros(nc, bool)
        mob_set[np.asarray(col_mobile_sel, np.int64)] = True
        gid_of = np.full(nc, -1, np.int64)
        gid_of[np.asarray(col_mobile_sel, np.int64)] = np.asarray(
            col_mobile_gid, np.int64
        )
        occ_mob = np.where(oc_live & mob_set[oc_c])[0]
        if len(occ_mob):
            mob_sel_j = jnp.asarray(occ_mob)
            mob_gid_j = jnp.asarray(gid_of[occ_col[occ_mob]])
    occ_gid_j = jnp.asarray(np.where(oc_live, cols_np[oc_c], 0))
    occ_live_j = jnp.asarray(oc_live[None, :].astype(np.float32))
    keep_sel_j = keep_gid_j = None
    if col_forces:
        keep = (
            np.asarray(col_force_keep, np.int64)
            if col_force_keep is not None
            else np.arange(nc, dtype=np.int64)
        )
        keep_sel_j = jnp.asarray(keep)
        keep_gid_j = jnp.asarray(cols_np[keep])

    kernel = _make_kernel(
        method=method, cutoff=cutoff, alpha_ewald=alpha_ewald, k_rf=k_rf,
        c_rf=c_rf, ann=1.0 if annihilate_sterics else 0.0,
        softcore_alpha=softcore_alpha, periodic=periodic,
        skip_min_image=skip_min_image, switch_distance=switch_distance,
        alch_coulomb=alch_coulomb, tr=tr, tc=tc,
        has_excl=excl_f32 is not None, col_forces=col_forces,
    )

    if grouped:
        col_imap = lambda i, j, _t=n_col_tiles: (0, i * _t + j)  # noqa: E731
        excl_imap = col_imap
    else:
        col_imap = lambda i, j: (0, j)  # noqa: E731
        excl_imap = lambda i, j: (i, j)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, 8), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tr, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, tc), col_imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, tc), col_imap, memory_space=pltpu.VMEM),
    ]
    if excl_f32 is not None:
        in_specs.append(
            pl.BlockSpec((tr, tc), excl_imap, memory_space=pltpu.VMEM)
        )
    out_specs = pl.BlockSpec((tr, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nr_pad, 8), jnp.float32)
    if col_forces:
        out_specs = (
            out_specs,
            pl.BlockSpec((8, tc), col_imap, memory_space=pltpu.VMEM),
        )
        out_shape = (out_shape, jax.ShapeDtypeStruct((8, S), jnp.float32))

    grid_spec = pl.GridSpec(
        grid=(n_row_tiles, n_col_tiles), in_specs=in_specs, out_specs=out_specs
    )
    # effective compute slots: padding tiles (first column id < 0) branch
    # out of the pair math, so only real tiles count
    if grouped:
        n_real_tiles = sum(max(1, -(-len(g[1]) // tc)) for g in groups)
    else:
        n_real_tiles = n_row_tiles * n_col_tiles
    compute_slots = n_real_tiles * tr * tc
    flops_per_pair = 80
    cost = pl.CostEstimate(
        flops=flops_per_pair * compute_slots,
        bytes_accessed=4 * (8 * S) * 3 + 4 * 8 * nr_pad * 3,
        transcendentals=3 * compute_slots,
    )

    feat_rows_j = jnp.asarray(feat_rows)
    feat_cols_j = jnp.asarray(feat_cols)
    excl_j = None if excl_f32 is None else jnp.asarray(excl_f32)
    slot_gid_j = jnp.asarray(np.where(sl_live, rows_np[sl_r], 0))
    row_live = jnp.asarray(sl_live[:, None].astype(np.float32))
    occ_const_j = (
        None if occ_const_np is None else jnp.asarray(occ_const_np, jnp.float32)
    )

    def _pass(x, box, lam_s, f_na, f_aa):
        xf = x.astype(jnp.float32)
        if occ_const_j is not None:
            xc = occ_const_j
            if mob_sel_j is not None:
                xc = xc.at[mob_sel_j].set(xf[mob_gid_j])
        else:
            xc = xf[occ_gid_j] * occ_live_j.T
        xct = jnp.zeros((8, S), jnp.float32).at[0:3, :].set(xc.T)
        xrt = jnp.zeros((nr_pad, 8), jnp.float32).at[:, 0:3].set(xf[slot_gid_j])
        blen = (
            jnp.diagonal(box).astype(jnp.float32)
            if box is not None
            else jnp.ones(3, jnp.float32)
        )
        params = jnp.zeros((1, 8), jnp.float32)
        params = params.at[0, 0].set(jnp.asarray(lam_s, jnp.float32))
        params = params.at[0, 1].set(jnp.asarray(f_na, jnp.float32))
        params = params.at[0, 2].set(jnp.asarray(f_aa, jnp.float32))
        params = params.at[0, 3:6].set(blen)

        args = [params, xrt, xct, feat_rows_j, feat_cols_j]
        if excl_j is not None:
            args.append(excl_j)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(*args)
        if col_forces:
            out, outc = out
        f_rows = out[:, 0:3] * row_live  # (nr_pad, 3)
        f = (
            jnp.zeros((n_atoms, 3), jnp.float32)
            .at[slot_gid_j]
            .add(f_rows)
        )
        if col_forces:
            fc = outc[0:3].T  # (ncpad, 3)
            f = f.at[keep_gid_j].add(fc[keep_sel_j])
        e = jnp.sum(out[:, 3]).astype(x.dtype)
        return e, f.astype(x.dtype)

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
            None if box is None else jnp.zeros_like(box),
            jnp.zeros_like(lam_s),
            jnp.zeros_like(f_na),
            jnp.zeros_like(f_aa),
        )

    pair_energy.defvjp(fwd, bwd)

    def pair_sum(x, box, lam_s, f_na, f_aa):
        return _pass(x, box, lam_s, f_na, f_aa)

    pair_sum.energy = pair_energy
    pair_sum.shape_info = dict(
        nr=nr, nc=nc, tr=tr, tc=tc, n_row_tiles=n_row_tiles,
        n_col_tiles=n_col_tiles, skip_min_image=skip_min_image,
        masked_pairs=int(excl_f32.sum()) if excl_f32 is not None else 0,
        n_groups=len(groups) if grouped else None,
        compute_slots=compute_slots,
    )
    return pair_sum
