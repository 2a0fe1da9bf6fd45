"""Cross-field fused launches (joint_infer_fields): several independent
fields' color classes merge laterally into one fused device program, with
per-field results identical to running each field alone."""

import numpy as np

from celeste_jl_tpu.models.params import ids
from celeste_jl_tpu.parallel.run import (joint_infer_fields,
                                         joint_infer_fields_pipelined,
                                         one_node_joint_infer)
from celeste_jl_tpu.synthetic import (gen_images, make_blank_images,
                                      sample_galaxy, sample_star)
from celeste_jl_tpu.utils.config import Config


def _field(seed, star_pos=(16.0, 16.0), gal_pos=(44.0, 46.0)):
    images = make_blank_images(H=60, W=60, sky_nmgy=0.05,
                               nelec_per_nmgy=2000.0)
    truth = [sample_star(pos=star_pos, r_flux=18.0),
             sample_galaxy(pos=gal_pos, r_flux=28.0, gal_radius_px=2.0)]
    gen_images(images, truth, seed=seed)
    return {"catalog": truth, "images": images}


def test_two_fields_one_launch_matches_per_field():
    cfg = Config(min_radius_pix=8.0)
    f1, f2 = _field(seed=1), _field(seed=2, star_pos=(18.0, 40.0))

    multi = joint_infer_fields([f1, f2], config=cfg, seed=42)
    assert len(multi) == 2 and all(len(r) == 2 for r in multi)

    # sources in these fields never conflict, so per-lane fits are
    # schedule-independent: the merged launch must reproduce the
    # single-field launches BIT-EXACTLY. Both paths now stage isolated
    # targets through the same code (_fit_isolated_multi) at the same
    # >=32-lane padded widths, so the compiled programs are identical and
    # per-lane vmap computation is content-independent; basin selection is
    # additionally margin-robust (_beats) so near-ties cannot flip with
    # packing.
    for fld, got in zip((f1, f2), multi):
        alone = one_node_joint_infer(fld["catalog"], fld["images"],
                                     config=cfg, seed=42)
        for a, b in zip(alone, got):
            np.testing.assert_array_equal(b.vs, a.vs)
            assert b.elbo == a.elbo

    # and the fits themselves are right
    for got in multi:
        assert got[0].vs[ids.is_star[0]] > 0.5
        assert got[1].vs[ids.is_star[0]] < 0.5


def test_pipelined_matches_sequential():
    """The double-buffered farm pipeline (dispatch group k+1's staging
    while group k is in flight) must yield results bit-identical to
    running each group through joint_infer_fields sequentially — same
    inputs, same program, only the host/device overlap differs. Lazy
    group construction (a generator) must also be consumed in order."""
    cfg = Config(min_radius_pix=8.0)

    built = []

    def lazy_groups():
        for spec in ((1, (16.0, 16.0)), (2, (18.0, 40.0)),
                     (3, (20.0, 22.0))):
            built.append(spec[0])
            yield [_field(seed=spec[0], star_pos=spec[1])]

    piped = []
    for res in joint_infer_fields_pipelined(lazy_groups(), config=cfg,
                                            seed=42):
        piped.append(res)
        # group k's results arrive only after group k+1 was staged (the
        # overlap), so the generator must already be ahead of the consumer
        assert len(built) >= min(len(piped) + 1, 3)

    assert len(piped) == 3
    for seed, pos, got in zip((1, 2, 3),
                              ((16.0, 16.0), (18.0, 40.0), (20.0, 22.0)),
                              piped):
        seq = joint_infer_fields([_field(seed=seed, star_pos=pos)],
                                 config=cfg, seed=42)
        for a, b in zip(seq[0], got[0]):
            np.testing.assert_array_equal(b.vs, a.vs)
            assert b.elbo == a.elbo


def test_fields_with_internal_conflicts_stay_correct():
    cfg = Config(min_radius_pix=8.0)
    # overlapping pair inside each field: conflict edges exist WITHIN a
    # field; the merged packer must still never co-schedule them
    f1 = {"catalog": [sample_star(pos=(20.0, 20.0), r_flux=25.0),
                      sample_star(pos=(24.0, 23.0), r_flux=22.0)],
          "images": make_blank_images(H=48, W=48, sky_nmgy=0.05,
                                      nelec_per_nmgy=2000.0)}
    gen_images(f1["images"], f1["catalog"], seed=3)
    f2 = {"catalog": [sample_galaxy(pos=(24.0, 24.0), r_flux=35.0,
                                    gal_radius_px=2.0)],
          "images": make_blank_images(H=48, W=48, sky_nmgy=0.05,
                                      nelec_per_nmgy=2000.0)}
    gen_images(f2["images"], f2["catalog"], seed=4)

    multi = joint_infer_fields([f1, f2], config=cfg, seed=42)
    r1, r2 = multi
    assert all(r.vs[ids.is_star[0]] > 0.5 for r in r1)
    assert r2[0].vs[ids.is_star[0]] < 0.5
    # deblended fluxes of the overlapping pair within 10%
    fluxes = sorted(np.exp(r.vs[ids.flux_loc[0]]) for r in r1)
    assert abs(fluxes[0] - 22.0) / 22.0 < 0.1, fluxes
    assert abs(fluxes[1] - 25.0) / 25.0 < 0.1, fluxes
