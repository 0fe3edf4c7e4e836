"""Spatial (atom-dimension) sharding: the tensor-parallel analog.

Shards the pair-sum and PME-reciprocal work of one system over a device
mesh axis (SURVEY.md 5.7: "spatial decomposition + distributed PME FFT
over ICI is the only TP-like pattern"). Scope honesty: positions stay
replicated per device (a 1M-atom coordinate array is 12 MB — tiny next to
the O(N * N/D) pair work); what is distributed is the compute and, on the
reciprocal path, the summed grid + FFT:

  * pair sum: each device evaluates a contiguous block of row tiles of the
    tiled kernel against all columns (identical per-pair math —
    potentials/pairs.py); energies and row forces are `psum`'d over ICI.
  * PME reciprocal: each device B-spline-spreads its atom slice onto a
    local charge grid; when the grid divides the mesh, the grids are
    reduce-scattered into x-slabs and the FFT runs DISTRIBUTED (local
    z/y transforms, `all_to_all` mesh transpose, local x transform,
    per-device y-slice influence sums — pme.make_pme_reciprocal_sharded),
    so no device holds the summed full grid or runs a full FFT;
    otherwise the grids are `psum`'d and the FFT runs replicated.
  * bonded terms / exclusion corrections / self terms are cheap and run
    replicated, counted once via a 1/D weight inside the summed local
    lagrangian.

A >=10M-atom single-system story would additionally shard the position
array itself (per-device atom slices with halo exchange for the pair
kernel); SURVEY.md 5.7 places that regime out of scope for the
reference's <=50k-atom baseline.

Autodiff runs *through* the collectives inside `shard_map` (the transpose
of psum is well-defined), so forces come out exactly as in the single-chip
path: F = psum(grad of the local partial energy).

This module is exercised on an 8-virtual-device CPU mesh in the tests and
by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..potentials.energy import make_energy_fn


def make_spatial_force_fn(
    system,
    mesh: Mesh,
    axis_name: str = "atoms",
    **energy_kwargs,
):
    """Build fn(x, box, globals) -> (E, F) sharded over mesh[axis_name].

    The single-device energy is composed per shard: each device owns a row
    block of the tiled pair kernel and an atom slice of the PME spread;
    everything else is replicated and weighted 1/D. Requires the 'tiled'
    pair backend (the row-block structure is what gets sharded).
    """
    ndev = mesh.shape[axis_name]
    n = system.n_atoms

    # per-device row slices of the (padded) active rows: build one energy
    # fn per device-slice is impossible under SPMD, so the slice is taken
    # dynamically from the device index inside the worker via equal-size
    # contiguous row blocks
    from ..potentials.nonbonded import make_nonbonded_energy
    from ..potentials.tiled import TILE, build_pair_features, make_tiled_pair_sum
    from ..potentials import bonded as bonded_mod

    nb = system.nonbonded
    if nb is None:
        raise ValueError("spatial sharding requires a nonbonded term")

    from ..potentials.nonbonded import (
        PME,
        CUTOFF_PERIODIC,
        CUTOFF_NONPERIODIC,
        choose_pme_params,
        reaction_field_constants,
    )

    method = energy_kwargs.get("nonbonded_method", "PME")
    cutoff = energy_kwargs.get("cutoff", 1.0)
    if method == PME:
        pme_params = choose_pme_params(
            np.diag(np.asarray(system.box)), cutoff,
            energy_kwargs.get("ewald_tolerance", 5e-4),
        )
        alpha = pme_params.alpha
        k_rf = c_rf = 0.0
    elif method in (CUTOFF_PERIODIC, CUTOFF_NONPERIODIC):
        alpha = 0.0
        k_rf, c_rf = reaction_field_constants(
            cutoff, energy_kwargs.get("rf_dielectric", 78.3)
        )
        pme_params = None
    else:
        alpha, k_rf, c_rf, pme_params = 0.0, 0.0, 0.0, None

    # --- distributed PME spread: each device B-spline-spreads its atom
    # slice onto a local grid; psum over the mesh axis assembles the full
    # grid and the (cheap) FFT + influence sum runs replicated, counted
    # once via the worker's 1/D weight. This removes the only O(N) runtime
    # term that was computed fully replicated (the spread), so reciprocal
    # compute now scales with the mesh like the pair sum does.
    sharded_recip = None
    _e_slab = None
    if pme_params is not None:
        from ..potentials.pme import make_pme_reciprocal, make_pme_reciprocal_sharded

        _recip_full = make_pme_reciprocal(pme_params)
        _spread = _recip_full.spread_grid
        _efg = _recip_full.energy_from_grid
        # distributed slab FFT when the grid divides the mesh: reduce-scatter
        # into x-slabs + local FFTs + all_to_all transpose (no device ever
        # holds the summed full grid or runs the full FFT); otherwise fall
        # back to psum(full grid) + replicated FFT
        Kx, Ky, _ = pme_params.grid
        _e_slab = (
            make_pme_reciprocal_sharded(pme_params, axis_name, ndev)
            if (Kx % ndev == 0 and Ky % ndev == 0)
            else None
        )
        per_a = -(-n // ndev)
        idx_all = np.zeros((ndev, per_a), np.int32)
        mask_all = np.zeros((ndev, per_a), np.float32)
        flat = np.arange(n, dtype=np.int32)
        for d in range(ndev):
            sl = flat[d * per_a : (d + 1) * per_a]
            idx_all[d, : len(sl)] = sl
            mask_all[d, : len(sl)] = 1.0
        idx_all_j = jnp.asarray(idx_all)
        mask_all_j = jnp.asarray(mask_all)

        def sharded_recip(positions, q_eff, box):
            d = jax.lax.axis_index(axis_name)
            idx = idx_all_j[d]
            msk = mask_all_j[d].astype(positions.dtype)
            g_local = _spread(positions[idx], q_eff[idx] * msk, box)
            # unweighted: the worker's 1/D rest weight counts it once
            if _e_slab is not None:
                return _e_slab(g_local, box)
            grid = jax.lax.psum(g_local, axis_name)
            return _efg(grid, box)

    # the full composed energy, used for the 'rest' terms (with the
    # reciprocal spread overridden to the device-sliced form above) and
    # the pair lambda factors
    full = make_nonbonded_energy(
        nb,
        method=method,
        cutoff=cutoff,
        alchemical=system.alchemical,
        alchemical_pme_treatment=energy_kwargs.get(
            "alchemical_pme_treatment", "direct-space"
        ),
        ewald_tolerance=energy_kwargs.get("ewald_tolerance", 5e-4),
        box_for_pme=system.box,
        backend="tiled",
        masses=system.masses,
        frozen_ref_positions=system.frozen_ref_positions,
        frozen_cull_skin=None,
        switch_distance=energy_kwargs.get("switch_distance"),
        recip_override=sharded_recip,
    )
    pair_sum = full.pair_sum
    rest_energy = full.rest
    pair_factors = full.pair_factors

    # bonded terms of the composed system (replicated, weighted 1/D)
    bonded_fn = _make_bonded_energy(system)

    # row-block decomposition: pad row tiles to a multiple of ndev
    feats = pair_sum  # the tiled pair_sum closes over feats internally;
    # rebuild a per-shard pair kernel over a row slice instead
    charges = np.asarray(nb.charge, np.float64)
    is_alch = np.zeros(n, bool)
    if system.alchemical is not None and len(system.alchemical.atoms):
        is_alch[np.asarray(system.alchemical.atoms, np.int64)] = True
    masses = system.masses
    in_rows = np.ones(n, bool)
    active_rows = None
    if masses is not None and (np.asarray(masses) <= 0).any():
        in_rows = (np.asarray(masses) > 0) | is_alch
        active_rows = np.where(in_rows)[0].astype(np.int32)
    rows = (
        np.arange(n, dtype=np.int32) if active_rows is None else active_rows
    )
    nr = len(rows)
    per = -(-nr // ndev)  # rows per device
    per = -(-per // TILE) * TILE  # pad to full tiles
    rows_padded = np.zeros(per * ndev, np.int32)
    rows_padded[:nr] = rows
    # one tiled pair kernel per ROW SLICE: all devices run the same program
    # on a different row slice, selected by axis_index; realized by passing
    # the slice's rows explicitly as features with a validity mask
    shard_feats = []
    sc = system.alchemical
    common = dict(
        method=method,
        cutoff=cutoff,
        alpha_ewald=alpha,
        k_rf=k_rf,
        c_rf=c_rf,
        annihilate_sterics=sc.annihilate_sterics if sc is not None else False,
        softcore_alpha=sc.softcore_alpha if sc is not None else 0.5,
        periodic=method in (PME, CUTOFF_PERIODIC),
        switch_distance=energy_kwargs.get("switch_distance"),
    )
    for d in range(ndev):
        sl = rows_padded[d * per : (d + 1) * per]
        live = (np.arange(per) + d * per) < nr
        f_d = build_pair_features(
            charges, nb.sigma, nb.epsilon, is_alch,
            active_rows=sl[live] if live.any() else sl[:1],
        )
        if not live.any():
            f_d = f_d._replace(n_rows=0)  # shard past the row count: inert
        # patch in_rows to the GLOBAL row set so both-sides 0.5 weighting
        # stays correct across shards
        f_d = f_d._replace(in_rows=np.pad(in_rows.astype(np.float64), (0, f_d.n_padded - n)))
        shard_feats.append(f_d)
    # all shards must share static shapes: pad row counts to the max
    max_nr_pad = max(f.n_rows_padded for f in shard_feats)
    kernels = []
    for f_d in shard_feats:
        if f_d.n_rows_padded < max_nr_pad:
            pad = max_nr_pad - f_d.n_rows_padded
            f_d = f_d._replace(
                row_idx=np.pad(f_d.row_idx, (0, pad)),
                n_rows_padded=max_nr_pad,
            )
        kernels.append(make_tiled_pair_sum(f_d, **common))

    # PME spread sharding: contiguous atom slices per device
    if pme_params is not None:
        from ..potentials.pme import make_pme_reciprocal

        recip = make_pme_reciprocal(pme_params)
    else:
        recip = None

    exact = energy_kwargs.get("alchemical_pme_treatment", "direct-space") == "exact"
    q_std_np = charges * (1.0 - is_alch)

    def worker(x, box, lam_s, f_na, f_aa, lam_e):
        d = jax.lax.axis_index(axis_name)
        # pair rows for this shard: lax.switch over the per-shard kernels
        # (identical shapes, different static row sets)
        e_pair = jax.lax.switch(
            d,
            [partial(lambda k, xx, bb: k.energy(xx, bb, lam_s, f_na, f_aa), k)
             for k in kernels],
            x, box,
        )
        # everything else replicated, counted once via 1/D
        e_rest = (bonded_fn(x, box) + rest_energy(
            x, box,
            {"lambda_sterics": lam_s, "lambda_electrostatics": lam_e},
        )) / ndev
        return e_pair + e_rest

    # NOTE on PME: rest_energy's reciprocal term is the sharded_recip
    # override above — per-device atom-slice spread, then either the
    # distributed slab FFT (grid divides the mesh) or psum'd grid +
    # replicated FFT; counted once via the same 1/D weight. Only positions
    # (12 MB at 1M atoms) remain replicated per device.

    # check_vma only when the distributed slab FFT is off: jax 0.9's fft
    # transpose rule drops the varying-axes tag, so grad-through-fft inside
    # shard_map trips the static checker; agreement with the single-device
    # path is pinned by tests/test_spatial.py instead
    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=(sharded_recip is None or _e_slab is None),
    )
    def sharded_ef(x, box, lam_s, f_na, f_aa, lam_e):
        e_local, g_local = jax.value_and_grad(worker)(
            x, box, lam_s, f_na, f_aa, lam_e
        )
        e = jax.lax.psum(e_local, axis_name)
        f = -jax.lax.psum(g_local, axis_name)
        return e, f

    def force_fn(x, box=None, globals_=None):
        g = globals_ or {}
        dtype = x.dtype
        lam_s, f_na, f_aa = pair_factors(g, dtype)
        lam_e = jnp.asarray(g.get("lambda_electrostatics", 1.0), dtype)
        if box is None:
            box = jnp.asarray(np.asarray(system.box), dtype)
        return sharded_ef(x, box, lam_s, f_na, f_aa, lam_e)

    force_fn.mesh = mesh
    force_fn.axis_name = axis_name
    force_fn.rows_per_device = per
    force_fn.distributed_fft = _e_slab is not None
    return force_fn


def _make_bonded_energy(system):
    from ..potentials import bonded

    terms = []
    if len(system.bonds):
        terms.append(lambda x, box: bonded.bond_energy(x, system.bonds, box))
    if len(system.angles):
        terms.append(lambda x, box: bonded.angle_energy(x, system.angles, box))
    if len(system.torsions):
        terms.append(lambda x, box: bonded.torsion_energy(x, system.torsions, box))
    if system.position_restraints is not None:
        terms.append(
            lambda x, box: bonded.position_restraint_energy(
                x, system.position_restraints, box
            )
        )
    for rest in system.centroid_restraints:
        terms.append(
            lambda x, box, _r=rest: bonded.centroid_restraint_energy(x, _r, box)
        )

    def bonded_fn(x, box):
        e = jnp.zeros((), x.dtype)
        for t in terms:
            e = e + t(x, box)
        return e

    return bonded_fn
