"""Projected pair-slot savings of per-row-group column culling.

The sweep kernel currently pairs ALL padded mobile rows against the UNION
of every row's reach ball (128 x 6.5k at the production flagship). Each
row only ever reaches columns inside its own permanent ball, so grouping
spatially-adjacent rows and giving each group its own culled column set
shrinks the pair space. This probe computes, from the REAL production
geometry (the bench flagship, reference protocol
examples/rotmove_cuda.yml:42-45), the exact padded slot counts the grouped
layout would have for several group sizes / column tiles — a build-time
calculation, no kernel execution.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=cpu python tools/probe_group_cull.py
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from blues_tpu.core.prmtop import repartition_hydrogen_masses
from blues_tpu.potentials.energy import make_energy_fn
from blues_tpu.testsystems import t4_scale_binding_site_box


def morton_order(p):
    """Order points by interleaved-bit (Morton) code of quantized coords."""
    q = ((p - p.min(0)) / max(float(np.ptp(p)), 1e-9) * 1023).astype(np.int64)
    code = np.zeros(len(p), np.int64)
    for b in range(10):
        for d in range(3):
            code |= ((q[:, d] >> b) & 1) << (3 * b + d)
    return np.argsort(code, kind="stable")


def grouped_slots(reach, order, G, tc, tr_of):
    """Total padded pair slots if rows (in `order`) are chunked into groups
    of G, each with its own column set = union of its rows' reach."""
    total = 0
    ncs = []
    for lo in range(0, len(order), G):
        rows = order[lo : lo + G]
        ncg = int(reach[rows].any(axis=0).sum())
        ncg_pad = -(-ncg // tc) * tc
        total += tr_of(len(rows)) * ncg_pad
        ncs.append(ncg)
    return total, ncs


def main():
    import warnings

    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 22340
    cutoff = 1.0
    system, x0 = t4_scale_binding_site_box(n_atoms=n_atoms)
    lig = system.topology.select_resname("LIG")
    bond_graph = np.concatenate(
        [np.asarray(e.idx).reshape(-1, 2) for e in (system.bonds, system.constraints) if len(e)]
    )
    system = system.replace(
        masses=repartition_hydrogen_masses(system.masses, bond_graph, 3.024)
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        frozen = system.freeze_radius(np.asarray(x0), lig, 0.5)
    efn = make_energy_fn(
        frozen, nonbonded_method="PME", cutoff=cutoff, ewald_tolerance=0.005,
        nonbonded_backend="sweep",
    )
    nb = efn.nonbonded
    rows, centers, radii = nb.cull_bounds
    cols = np.asarray(nb.cull_cols, np.int64)
    x = np.asarray(x0, np.float64)
    L = np.diag(np.asarray(frozen.box, np.float64))
    print(f"rows {len(rows)}, culled cols {len(cols)} / {frozen.n_atoms}")

    # exact pairwise reachability (rows x cols): mobile col k uses its own
    # ball (center_k, r_k); frozen col uses its static position (r=0)
    rpos = {int(a): k for k, a in enumerate(rows)}
    ccent = x[cols].copy()
    crad = np.zeros(len(cols))
    for j, c in enumerate(cols):
        k = rpos.get(int(c))
        if k is not None:
            ccent[j] = centers[k]
            crad[j] = radii[k]
    d = centers[:, None, :] - ccent[None, :, :]
    d -= L * np.round(d / L)
    reach = (d * d).sum(-1) <= (radii[:, None] + crad[None, :] + cutoff) ** 2

    alch = np.zeros(frozen.n_atoms, bool)
    alch[np.asarray(frozen.alchemical.atoms, np.int64)] = True
    r0 = ~alch[rows]  # E0 sweep rows (non-alchemical mobiles)
    c0 = ~alch[cols]

    def tr_of_cur(nr):
        t = 8
        while t < min(nr, 128):
            t *= 2
        return t

    for name, rsel, csel in (
        ("MAIN (all rows x all cols)", np.ones(len(rows), bool), np.ones(len(cols), bool)),
        ("E0 (non-alch rows x non-alch cols)", r0, c0),
    ):
        ridx = np.where(rsel)[0]
        reach_s = reach[np.ix_(ridx, np.where(csel)[0])]
        nr, nc = reach_s.shape
        order = morton_order(centers[ridx])
        for tc in (256, 512):
            cur = tr_of_cur(nr) * max(1, -(-nc // tc)) * tc
            line = [f"{name}: nr={nr} nc={nc} tc={tc} current={cur/1e3:.0f}k"]
            for G in (8, 16, 32):
                tot, ncs = grouped_slots(
                    reach_s, order, G, tc, lambda g: max(8, 1 << (g - 1).bit_length())
                )
                line.append(
                    f"G={G}: {tot/1e3:.0f}k ({cur/tot:.2f}x, cols/grp "
                    f"{min(ncs)}-{max(ncs)})"
                )
            print("  ".join(line))
        # per-row reachable col count distribution (the ideal bound)
        per_row = reach_s.sum(1)
        print(
            f"  per-row reachable cols: min {per_row.min()} med "
            f"{int(np.median(per_row))} max {per_row.max()} "
            f"(ideal slots {per_row.sum()/1e3:.0f}k)"
        )


if __name__ == "__main__":
    main()


def classes():
    """Second analysis: two-class layout — one big-tile sweep for the
    cage-ball rows (which all share ~the same reach) + small grouped tiles
    for the anchored-chain rows."""
    import warnings

    system, x0 = t4_scale_binding_site_box(n_atoms=22340)
    lig = system.topology.select_resname("LIG")
    bond_graph = np.concatenate(
        [np.asarray(e.idx).reshape(-1, 2) for e in (system.bonds, system.constraints) if len(e)]
    )
    system = system.replace(
        masses=repartition_hydrogen_masses(system.masses, bond_graph, 3.024)
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        frozen = system.freeze_radius(np.asarray(x0), lig, 0.5)
    efn = make_energy_fn(
        frozen, nonbonded_method="PME", cutoff=1.0, ewald_tolerance=0.005,
        nonbonded_backend="sweep",
    )
    nb = efn.nonbonded
    rows, centers, radii = nb.cull_bounds
    cols = np.asarray(nb.cull_cols, np.int64)
    x = np.asarray(x0, np.float64)
    L = np.diag(np.asarray(frozen.box, np.float64))
    alch = np.zeros(frozen.n_atoms, bool)
    alch[np.asarray(frozen.alchemical.atoms, np.int64)] = True
    hist, edges = np.histogram(radii, bins=[0, 0.2, 0.4, 0.6, 0.8, 1.0, 1.5, 2.0, 5.0])
    print("ball radius histogram:", dict(zip(edges[:-1].tolist(), hist.tolist())))
    print(f"anchored (r<0.9): {(radii < 0.9).sum()}, caged: {(radii >= 0.9).sum()}; "
          f"alch rows: {alch[rows].sum()}")
    rpos = {int(a): k for k, a in enumerate(rows)}
    ccent = x[cols].copy(); crad = np.zeros(len(cols))
    for j, c in enumerate(cols):
        k = rpos.get(int(c))
        if k is not None:
            ccent[j] = centers[k]; crad[j] = radii[k]
    d = centers[:, None, :] - ccent[None, :, :]
    d -= L * np.round(d / L)
    reach = (d * d).sum(-1) <= (radii[:, None] + crad[None, :] + 1.0) ** 2
    r0 = ~alch[rows]; c0sel = np.where(~alch[cols])[0]
    reach0 = reach[np.ix_(np.where(r0)[0], c0sel)]
    rad0 = radii[r0]; cent0 = centers[r0]
    big = rad0 >= 0.9
    for tc in (256, 512):
        nbig = int(big.sum())
        trb = max(8, 1 << (nbig - 1).bit_length())
        ncb = int(reach0[big].any(0).sum())
        slots_big = trb * (-(-ncb // tc) * tc)
        small_idx = np.where(~big)[0]
        order = morton_order(cent0[small_idx])
        line = [f"two-class tc={tc}: big {nbig} rows (tr {trb}) x {ncb} cols = {slots_big/1e3:.0f}k"]
        for G in (8, 16):
            tot, ncs = grouped_slots(
                reach0[small_idx], order, G, tc,
                lambda g: max(8, 1 << (g - 1).bit_length()),
            )
            line.append(
                f"small G={G}: {tot/1e3:.0f}k (cols/grp {min(ncs)}-{max(ncs)}) "
                f"TOTAL {(slots_big+tot)/1e3:.0f}k = {983/((slots_big+tot)/1e3):.2f}x"
            )
        print("  ".join(line))


