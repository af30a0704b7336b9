"""Config-layer tests: keyword coverage, defaults, sample config parsing."""

import math
import os

import pytest

from velociraptor_stf_tpu.utils import config as C
from velociraptor_stf_tpu.utils import units as U

REF_SAMPLE = "/root/reference/examples/sample_dmcosmological_run.cfg"


def test_defaults_match_reference():
    """Defaults mirror reference Options() (allvars.h:658-848)."""
    o = C.Options()
    assert o.ellphys == 0.2
    assert o.ellthreshold == 1.5
    assert o.thetaopen == 0.05
    assert o.Vratio == 1.25
    assert o.MinSize == 20
    assert o.HaloMinSize == -1
    assert o.siglevel == 2.0
    assert o.ellvel == 0.5
    assert o.ellhalo6dvfac == 1.25
    assert o.fofbgtype == C.FOF6D
    assert o.foftype == C.FOFSTPROB
    assert o.partsearchtype == C.PSTALL
    assert o.Nvel == 32 and o.Nsearch == 256
    assert o.Ncellfac == 0.01
    assert o.uinfo.Eratio == 1.0
    assert o.uinfo.maxunbindfrac == 0.5
    assert o.uinfo.cmdelta == 0.02
    assert o.uinfo.TreeThetaOpen == 0.5
    assert o.H == 100.0 and o.h == 1.0


@pytest.mark.skipif(not os.path.exists(REF_SAMPLE), reason="reference absent")
def test_parse_sample_dm_config():
    o = C.parse_config_file(REF_SAMPLE)
    o = C.config_check(o)
    # values from the sample file
    assert o.ihdfnameconvention == 2
    assert o.icosmologicalin == 1
    assert o.G == pytest.approx(43.0211349)
    assert o.lengthtokpc == 1000.0
    assert o.masstosolarmass == 1.0e10
    assert o.partsearchtype == 2
    assert o.iBaryonSearch == 0
    assert o.iSubSearch == 1
    assert o.MinSize == 20
    assert o.HaloMinSize == 35
    assert o.fofbgtype == 5
    assert o.ellhalo3dxfac == pytest.approx(0.20)
    # Halo_3D_linking_length sets product ellphys*ellhalophysfac = 0.2
    assert o.ellphys * o.ellhalophysfac == pytest.approx(0.20)
    assert o.Ncellfac == pytest.approx(0.01)
    assert o.Nvel == 32 and o.Nsearch == 256
    assert o.foftype == 1 and o.iiterflag == 1
    assert o.ellthreshold == pytest.approx(2.5)
    assert o.Vratio == pytest.approx(2.0)
    assert o.thetaopen == pytest.approx(0.10)
    assert o.iHaloCoreSearch == 2
    assert o.halocorenumloops == 8
    assert o.halocorexfaciter == pytest.approx(0.75)
    assert o.uinfo.unbindflag == 1
    assert o.uinfo.Eratio == pytest.approx(0.95)
    assert o.uinfo.minEfrac == pytest.approx(0.65)
    assert o.uinfo.bgpot == 1
    assert o.uinfo.fracpotref == pytest.approx(1.0)
    assert o.Omega_m == pytest.approx(0.3)
    assert o.Omega_Lambda == pytest.approx(0.7)
    assert o.virlevel == pytest.approx(500)
    assert o.iInclusiveHalo == 3
    assert o.iaperturecalc == 1
    assert o.aperturenum == 2
    assert o.aperture_values_kpc == [10.0, 100.0]
    assert o.apertureprojnum == 1
    assert o.SOnum == 5
    assert o.SOthresholds_values_crit == [25.0, 100.0, 500.0, 1000.0, 2500.0]
    assert o.iprofilecalc == 1
    assert o.profilenbins == 20
    assert len(o.profile_bin_edges) == 20
    assert o.ibinaryout == C.OUTHDF
    # Snapshot_value=SNAP parses as 0 under atoi semantics
    assert o.snapshotvalue == 0
    # nothing unknown in the production sample
    assert o.unknown_keys == []


@pytest.mark.skipif(not os.path.isdir("/root/reference/examples"),
                    reason="reference absent")
def test_parse_all_reference_examples():
    """Every production config in the reference parses with no unknown keys."""
    import glob

    # configs named in BASELINE.md; obsolete keywords in other examples are
    # silently ignored, matching the reference's strcmp-chain behaviour
    names = ["sample_*.cfg", "genesis*.cfg", "surfs*.cfg"]
    for pat in names:
        for cfg in glob.glob(f"/root/reference/examples/{pat}"):
            o = C.parse_config_file(cfg)
            assert o.unknown_keys == [], f"{cfg}: {o.unknown_keys}"


def test_config_check_validation():
    o = C.Options()
    o.iaperturecalc = 1
    o.aperturenum = 3
    o.aperture_values_kpc = [10.0]
    with pytest.raises(ValueError):
        C.config_check(o)


def test_cosmology_eds():
    """Einstein-de-Sitter: H(a) = H0 a^-1.5, rhocrit = 3H^2/8piG."""
    o = C.Options()
    o.Omega_m, o.Omega_Lambda, o.G = 1.0, 0.0, 43.0211349
    U.calc_cosmo_params(o, 1.0)
    assert o.Omega_k == pytest.approx(0.0)
    assert U.get_hubble(o, 0.25) == pytest.approx(100.0 * 0.25 ** -1.5)
    assert o.rhocrit == pytest.approx(3 * 100 ** 2 / (8 * math.pi * o.G))
    assert o.rhobg == pytest.approx(o.rhocrit)
    # EdS BN98 overdensity = 18 pi^2
    assert o.virBN98 == pytest.approx(18 * math.pi ** 2)


def test_cosmology_lcdm():
    o = C.Options()
    o.Omega_m, o.Omega_Lambda, o.h = 0.3, 0.7, 0.7
    U.calc_cosmo_params(o, 1.0)
    assert U.get_hubble(o, 1.0) == pytest.approx(70.0)
    x = 0.3 - 1  # Omega(a=1)-1 with BN98's x definition
    assert o.virBN98 == pytest.approx(
        18 * math.pi ** 2 + 82 * (-0.7) - 39 * 0.7 ** 2, rel=1e-6)


def test_config_check_strict_validations():
    """CLI-mode ConfigCheck requirements (ui.cxx:751-800)."""
    opt = C.Options()
    opt.lengthtokpc = opt.velocitytokms = opt.masstosolarmass = 1.0
    C.config_check(opt, strict=True)   # valid

    bad = C.Options()
    bad.lengthtokpc = -1.0
    bad.velocitytokms = bad.masstosolarmass = 1.0
    with pytest.raises(ValueError):
        C.config_check(bad, strict=True)

    hdf = C.Options()
    hdf.lengthtokpc = hdf.velocitytokms = hdf.masstosolarmass = 1.0
    hdf.inputtype = C.IOHDF
    hdf.ihdfnameconvention = -1
    with pytest.raises(ValueError):
        C.config_check(hdf, strict=True)

    bar = C.Options()
    bar.lengthtokpc = bar.velocitytokms = bar.masstosolarmass = 1.0
    bar.iBaryonSearch = 1
    bar.partsearchtype = C.PSTGAS
    with pytest.raises(ValueError):
        C.config_check(bar, strict=True)

    # Bound_halos auto-clears under iKeepFOF (reference errors; repo
    # defaults iBoundHalos=1, so clearing keeps iKeepFOF configs valid)
    kf = C.Options()
    kf.iKeepFOF = 1
    C.config_check(kf)
    assert kf.iBoundHalos == 0
