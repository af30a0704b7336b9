"""Command-line driver.

TPU-native equivalent of the reference ``main()`` / ``GetArgs``
(/root/reference/src/main.cxx:20, /root/reference/src/ui.cxx:9): parse the
same CLI flags (-C config, -i input, -I input type, -s num files,
-o output, -Z read threads, -v verbose), read the snapshot, derive unit
scalings and cosmology, run the search pipeline, write catalogs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from .io import gadget as gadget_io
from .io import hdf as hdf_io
from .io import writers
from .models import pipeline, unbind as unbind_mod
from .utils import config as C
from .utils import units
from .utils.timing import PhaseTimer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vrtpu",
        description="TPU-native VELOCIraptor: halo/subhalo finder")
    p.add_argument("-C", dest="config", required=True,
                   help="configuration file (reference keyword format)")
    p.add_argument("-i", dest="input", required=True, help="input snapshot")
    p.add_argument("-I", dest="inputtype", type=int, default=C.IOGADGET,
                   help="input type 1=gadget 2=hdf 3=tipsy 4=ramses")
    p.add_argument("-s", dest="num_files", type=int, default=1)
    p.add_argument("-o", dest="output", default=None,
                   help="output base name (overrides config Output)")
    p.add_argument("-Z", dest="nsnapread", type=int, default=1)
    p.add_argument("-v", dest="verbose", type=int, default=None)
    # reference GetArgs extras (ui.cxx:46-60): gadget extra-block counts
    # and the RAMSES secondary snapshot name
    p.add_argument("-G", dest="gnsphblocks", type=int, default=None,
                   help="number of extra gadget SPH blocks")
    p.add_argument("-S", dest="gnstarblocks", type=int, default=None,
                   help="number of extra gadget star blocks")
    p.add_argument("-B", dest="gnbhblocks", type=int, default=None,
                   help="number of extra gadget BH blocks")
    p.add_argument("-t", dest="ramsessnapname", default=None,
                   help="RAMSES snapshot naming (reference -t)")
    return p


def read_snapshot(opt: C.Options):
    """Dispatch to the format reader; returns (pos, vel, pids, ptype, mass,
    boxsize, extras) in *internal units* (input conversions applied,
    reference ReadData io.cxx:73)."""
    want_types = None
    if opt.partsearchtype == C.PSTDARK and not opt.iBaryonSearch:
        want_types = [1, 2, 3]
    elif opt.partsearchtype == C.PSTGAS:
        want_types = [0]
    elif opt.partsearchtype == C.PSTSTAR:
        want_types = [4]

    extras = None
    nread = max(1, int(getattr(opt, "nsnapread", 1)))
    if opt.inputtype == C.IOGADGET:
        hdr, pos, vel, pids, ptype, mass = gadget_io.read_gadget(
            opt.fname, parttypes=want_types, nsnapread=nread)
        boxsize = hdr.boxsize
        opt.a = hdr.time if opt.icosmologicalin else 1.0
        opt.Omega_m = hdr.omega0 or opt.Omega_m
        opt.Omega_Lambda = hdr.omega_lambda or opt.Omega_Lambda
        opt.h = hdr.hubble_param or opt.h
        ntot = hdr.ntotal
    elif opt.inputtype == C.IOHDF:
        hdr, pos, vel, pids, ptype, mass, extras = hdf_io.read_hdf(
            opt.fname, parttypes=want_types,
            convention=opt.ihdfnameconvention, nsnapread=nread)
        if extras is not None and not any(
                np.abs(v).max() > 0 for v in extras.values() if len(v)):
            extras = None
        boxsize = hdr.boxsize
        opt.a = hdr.time if opt.icosmologicalin else 1.0
        opt.Omega_m = hdr.omega0 or opt.Omega_m
        opt.Omega_Lambda = hdr.omega_lambda or opt.Omega_Lambda
        opt.h = hdr.hubble_param or opt.h
        ntot = int(hdr.npart_total.sum()) or len(pos)
    elif opt.inputtype == C.IOTIPSY:
        from .io import tipsy as tipsy_io

        hdr, pos, vel, pids, ptype, mass = tipsy_io.read_tipsy(opt.fname)
        boxsize = opt.p
        ntot = len(pos)
    elif opt.inputtype == C.IORAMSES:
        from .io import ramses as ramses_io

        # fname = snapshot directory; snap number from the trailing digits
        # (reference -i dir + opt.ramsessnapname, ramsesio.cxx:92-96)
        path = opt.fname.rstrip("/")
        snap = getattr(opt, "ramsessnapname", None)
        if not snap:
            import glob as _glob
            import re as _re

            infos = sorted(_glob.glob(os.path.join(path, "info_*.txt")))
            if infos:
                snap = _re.search(r"info_(\w+)\.txt$",
                                  infos[0]).group(1)
            else:
                m = _re.search(r"(\d+)$", path)
                snap = m.group(1).zfill(5) if m else "00001"
        hdr, pos, vel, pids, ptype, mass, extras = ramses_io.read_ramses(
            path, snap, parttypes=want_types)
        boxsize = hdr.boxsize
        opt.a = hdr.aexp if opt.icosmologicalin else 1.0
        opt.Omega_m = hdr.omega_m or opt.Omega_m
        opt.Omega_Lambda = hdr.omega_l or opt.Omega_Lambda
        opt.h = (hdr.h0 / 100.0) or opt.h
        ntot = len(pos)
        if extras is not None and not any(
                np.abs(v).max() > 0 for v in extras.values() if len(v)):
            extras = None
    elif opt.inputtype == C.IONCHILADA:
        from .io import nchilada as nch_io

        hdr, pos, vel, pids, ptype, mass = nch_io.read_nchilada(
            opt.fname, parttypes=want_types)
        boxsize = opt.p
        opt.a = hdr.time if opt.icosmologicalin and hdr.time else opt.a
        ntot = len(pos)
    else:
        raise NotImplementedError(
            f"input type {opt.inputtype} not implemented "
            "(gadget=1, hdf=2, tipsy=3, ramses=4, nchilada=5)")

    # unit conversions (reference readers apply l/v/m conversions inline)
    if opt.lengthinputconversion != 1.0:
        pos = pos * opt.lengthinputconversion
        boxsize = boxsize * opt.lengthinputconversion
    if opt.velocityinputconversion != 1.0:
        vel = vel * opt.velocityinputconversion
    if opt.massinputconversion != 1.0:
        mass = mass * opt.massinputconversion
    # interparticle spacing -> linking length scale
    # (reference gadgetio.cxx:1417 / hdfio.cxx:1967)
    if opt.icosmologicalin and boxsize > 0:
        opt.ellxscale = units.interparticle_spacing(boxsize, ntot)
        opt.p = boxsize
    # zoom (HIGHRES) multi-resolution input: low-res DM types (2/3) or a DM
    # mass spread marks a zoom run — the linking-length scale then comes
    # from the HIGH-RES interparticle spacing (Effective_resolution, or the
    # spacing implied by the lightest DM particle), and heavier DM counts
    # as interloper (reference gadgetio.cxx:1370-1412, zoomlowmassdm)
    if ptype is not None:
        pt = np.asarray(ptype)
        dm = pt == 1
        lowres = (pt == 2) | (pt == 3)
        if dm.any():
            mp_dm = float(np.min(mass[dm]))
            multires = bool(lowres.any()) or \
                float(np.max(mass[dm])) > mp_dm * (1 + 1e-4)
            if multires:
                opt.zoomlowmassdm = mp_dm * (1 + 1e-4)
                if opt.icosmologicalin and boxsize > 0:
                    if opt.Neff > 0:
                        opt.ellxscale = boxsize / opt.Neff
                    else:
                        # total DM mass / high-res particle mass = effective
                        # uniform-resolution particle count
                        mtot_dm = float(mass[dm | lowres].sum())
                        neff = max(mtot_dm / mp_dm, 1.0) ** (1.0 / 3.0)
                        opt.ellxscale = boxsize / neff
    return (pos, vel, pids, ptype, mass,
            boxsize if boxsize > 0 else None, extras)


def _auto_mesh():
    """Device mesh for the run: all local devices when more than one (the
    TPU analog of launching the reference under mpirun, main.cxx:33); the
    VR_MESH env var overrides (0/1 = force single-device, N = first N
    devices)."""
    import jax

    want = os.environ.get("VR_MESH")
    ndev = jax.device_count()
    if want is not None:
        ndev = min(int(want), ndev)
    if ndev <= 1:
        return None
    from .parallel.mesh import make_mesh

    return make_mesh(ndev)


def run(opt: C.Options) -> pipeline.CatalogResult:
    """Full standalone run: read, search, write (reference main())."""
    import os

    from .utils.timing import profile_trace

    timer = PhaseTimer(verbose=opt.iverbose)
    with timer.phase("read"):
        pos, vel, pids, ptype, mass, boxsize, extras = read_snapshot(opt)
    mesh = _auto_mesh()
    if mesh is not None and opt.iverbose:
        print(f"Running sharded over {mesh.devices.size} devices")
    # VR_PROFILE=<dir>: jax.profiler trace of the compute pipeline
    # (SURVEY.md §5 — the structured replacement for the reference's
    # TIME:: wall-clock lines)
    with profile_trace(os.environ.get("VR_PROFILE")):
        res = pipeline.find_structures(opt, pos, vel, mass,
                                       boxsize=boxsize,
                                       ptype=ptype, extras=extras,
                                       mesh=mesh)
    for k, v in res.timings.items():
        timer.record(k, v)

    with timer.phase("output"):
        ng = res.ngroups
        efrac = None
        id_mbp = id_minpot = None
        order_bind = None
        if res.W is not None and ng > 0:
            import jax.numpy as jnp

            gcmvel = jnp.asarray(res.props["gcmvel"])
            ngp = len(res.props["gmass"]) - 1
            perm, mbp, minpot = unbind_mod.sort_by_binding_energy(
                jnp.asarray(vel), jnp.asarray(mass),
                jnp.asarray(np.minimum(res.pfof, ngp)),
                jnp.asarray(res.W), ngp, gcmvel,
                by_energy=bool(opt.iSortByBindingEnergy))
            order_bind = np.asarray(perm)
            mbp_np = np.asarray(mbp)[1:ng + 1]
            minpot_np = np.asarray(minpot)[1:ng + 1]
            okb = (mbp_np >= 0) & (mbp_np < len(pids))
            id_mbp = np.where(okb, pids[np.clip(mbp_np, 0, len(pids) - 1)], -1)
            id_minpot = np.where(okb, pids[np.clip(minpot_np, 0,
                                                   len(pids) - 1)], -1)
            # actual mbp/minpot particle phase coordinates for the
            # Xcmbp/Xcminpot columns (reference gposmbp/gposminpot,
            # substructureproperties.cxx:3970-3975); CM fallback otherwise
            pos_np_, vel_np_ = np.asarray(pos), np.asarray(vel)
            gcm_rows = np.asarray(res.props["gcm"])[1:ng + 1]
            gcmv_rows = np.asarray(res.props["gcmvel"])[1:ng + 1]
            mb_c = np.clip(mbp_np, 0, len(pos_np_) - 1)
            mp_c = np.clip(minpot_np, 0, len(pos_np_) - 1)
            pos_mbp = np.where(okb[:, None], pos_np_[mb_c], gcm_rows)
            vel_mbp = np.where(okb[:, None], vel_np_[mb_c], gcmv_rows)
            pos_minpot = np.where(okb[:, None], pos_np_[mp_c], gcm_rows)
            vel_minpot = np.where(okb[:, None], vel_np_[mp_c], gcmv_rows)
        else:
            pos_mbp = vel_mbp = pos_minpot = vel_minpot = None
        numsub = None
        if res.parent is not None:
            numsub = np.zeros(ng + 1, np.int64)
            par_ = np.asarray(res.parent[1:ng + 1], np.int64)
            np.add.at(numsub, par_[par_ > 0], 1)
        def _write_set(outname, sel_gids):
            """Write one catalog set restricted to ``sel_gids`` (1-based
            group ids, renumbered 1..k in order).  Used for the
            field/substructure split of ``Separate_output_files``
            (reference main.cxx:469-523)."""
            k = len(sel_gids)
            gmap = np.zeros(ng + 1, np.int32)
            gmap[sel_gids] = np.arange(1, k + 1)
            rows = np.concatenate([[0], sel_gids])
            props_s = {key: np.asarray(v)[rows] for key, v in
                       res.props.items()}
            host_s = par_s = lev_s = sty_s = None
            if res.hostid is not None:
                h = np.asarray(res.hostid)[rows]
                host_s = np.where(h > 0, gmap[np.clip(h, 0, ng)], -1)
            if res.parent is not None:
                p = np.asarray(res.parent)[rows]
                par_s = gmap[np.clip(p, 0, ng)]
            if res.hierarchy_level is not None:
                lev_s = np.asarray(res.hierarchy_level)[rows]
            if res.stype is not None:
                sty_s = np.asarray(res.stype)[rows]
            num_s = None
            if numsub is not None:
                num_s = numsub[rows]
            idm = id_mbp[sel_gids - 1] if id_mbp is not None else None
            idp = id_minpot[sel_gids - 1] if id_minpot is not None else None
            sl = sel_gids - 1
            cols_s = writers.properties_table(
                opt, props_s, k, hostid=host_s, numsubstruct=num_s,
                id_mbp=idm, id_minpot=idp, level=lev_s, stype=sty_s,
                pos_mbp=None if pos_mbp is None else pos_mbp[sl],
                vel_mbp=None if vel_mbp is None else vel_mbp[sl],
                pos_minpot=None if pos_minpot is None else pos_minpot[sl],
                vel_minpot=None if vel_minpot is None else vel_minpot[sl])
            writers.write_properties(opt, outname, cols_s, k)
            writers.write_group_catalog(opt, outname, gmap[res.pfof], pids,
                                        k, order_within_group=order_bind,
                                        ptype=ptype)
            writers.write_hierarchy(
                opt, outname,
                par_s.astype(np.int64) if par_s is not None
                else np.zeros(k + 1, np.int64), k)

        if opt.iseparatefiles and res.hostid is not None:
            all_gids = np.arange(1, ng + 1)
            isfield = np.asarray(res.hostid[1:ng + 1]) == -1
            _write_set(opt.outname, all_gids[isfield])
            _write_set(opt.outname + ".sublevels", all_gids[~isfield])
        else:
            cols = writers.properties_table(
                opt, res.props, ng, hostid=res.hostid, numsubstruct=numsub,
                id_mbp=id_mbp, id_minpot=id_minpot,
                level=res.hierarchy_level, stype=res.stype,
                pos_mbp=pos_mbp, vel_mbp=vel_mbp,
                pos_minpot=pos_minpot, vel_minpot=vel_minpot)
            writers.write_properties(opt, opt.outname, cols, ng)
            writers.write_group_catalog(opt, opt.outname, res.pfof, pids,
                                        ng, order_within_group=order_bind,
                                        ptype=ptype)
            writers.write_hierarchy(
                opt, opt.outname,
                res.parent if res.parent is not None
                else np.zeros(ng + 1, np.int64), ng)
        if opt.isubfindoutput:
            # functional stand-in for the reference's (stub)
            # WriteSUBFINDProperties (io.cxx:3483): the property table in a
            # .subproperties file
            cols_sf = writers.properties_table(
                opt, res.props, ng, hostid=res.hostid, numsubstruct=numsub,
                id_mbp=id_mbp, id_minpot=id_minpot,
                level=res.hierarchy_level, stype=res.stype)
            writers.write_properties(opt, opt.outname + ".subprop", cols_sf,
                                     ng)
            import os as _os

            _os.replace(opt.outname + ".subprop.properties",
                        opt.outname + ".subproperties")
        if opt.iprofilecalc:
            writers.write_profiles(opt, opt.outname, res.props, ng,
                                   hostid=res.hostid)
        if res.so_offsets is not None:
            writers.write_so_catalog(opt, opt.outname, res.so_offsets,
                                     res.so_indices, pids, ng, ptype=ptype)
        if opt.iextendedoutput:
            # reference WriteExtendedOutput (io.cxx:3826, main.cxx:526)
            writers.write_extended_output(opt, opt.outname, pids, res.pfof,
                                          hostid=res.hostid,
                                          stype=res.stype)
        writers.write_config_info(opt, opt.outname)
        writers.write_sim_info(opt, opt.outname)
        writers.write_unit_info(opt, opt.outname)
        if opt.iwritefof:
            writers.write_fof_grp(opt.outname,
                                  res.pfof if res.pfof3d is None
                                  else res.pfof3d)
    timer.report()
    return res


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    opt = C.parse_config_file(args.config)
    opt.fname = args.input
    opt.inputtype = args.inputtype
    opt.num_files = args.num_files
    opt.nsnapread = args.nsnapread
    if args.output:
        opt.outname = args.output
    if args.verbose is not None:
        opt.iverbose = args.verbose
    if args.gnsphblocks is not None:
        opt.gnsphblocks = args.gnsphblocks
    if args.gnstarblocks is not None:
        opt.gnstarblocks = args.gnstarblocks
    if args.gnbhblocks is not None:
        opt.gnbhblocks = args.gnbhblocks
    if args.ramsessnapname is not None:
        opt.ramsessnapname = args.ramsessnapname
    if not opt.outname:
        print("No output name given (config Output= or -o), terminating",
              file=sys.stderr)
        return 9
    C.config_check(opt, strict=True)
    res = run(opt)
    print(f"Found {res.ngroups} structures; catalogs written to "
          f"{opt.outname}.*")
    return 0


if __name__ == "__main__":
    sys.exit(main())
