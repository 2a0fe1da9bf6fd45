"""Static decomposition of fused-schedule utilization: pad lanes vs
footprint-mask fill, per phase (class sweeps / wide probe+polish /
isolated), WITHOUT running any fits.

Stages the same merged multi-field schedule as benchmark/run_multifield.py
(via parallel.run._merged_states_classes + fused._fused_joint_dispatch with
the device programs stubbed out), then prints, per phase:
  - lane fill: real lanes / padded width, weighted by lane-pixels
  - mask fill: mean real-lane masked-pixel fraction cnt / (B*P*P)
  - product = the utilization ceiling that phase can reach
Used to target VERDICT round-3 item 3a (utilization 0.174 -> >= 0.5).

Env: MF_FIELDS/MF_SOURCES/MF_SIZE/MF_SEED as run_multifield.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

M = int(os.environ.get("MF_FIELDS", "8"))
N_SOURCES = int(os.environ.get("MF_SOURCES", "128"))
SIZE = int(os.environ.get("MF_SIZE", "512"))
SEED = int(os.environ.get("MF_SEED", "7"))


def main():
    from celeste_jl_tpu.detection.detect import detect_sources
    from celeste_jl_tpu.parallel import fused as F
    from celeste_jl_tpu.parallel import run as R
    from celeste_jl_tpu.synthetic import (gen_images_fast, make_blank_images,
                                          sample_galaxy, sample_star)
    from celeste_jl_tpu.utils.config import Config

    margin = 16.0
    n_star = N_SOURCES // 2

    def make_field(seed):
        rng = np.random.default_rng(seed)
        truth = []
        pos = margin + rng.random((N_SOURCES, 2)) * (SIZE - 2 * margin)
        for i in range(N_SOURCES):
            p = tuple(pos[i])
            if i < n_star:
                truth.append(sample_star(pos=p, r_flux=float(
                    np.exp(rng.normal(3.0, 0.6)))))
            else:
                truth.append(sample_galaxy(
                    pos=p, r_flux=float(np.exp(rng.normal(3.2, 0.5))),
                    gal_radius_px=float(np.exp(rng.normal(0.7, 0.3))),
                    gal_axis_ratio=float(rng.uniform(0.25, 0.9)),
                    gal_angle=float(rng.uniform(0.0, np.pi))))
        images = make_blank_images(H=SIZE, W=SIZE, sky_nmgy=0.05,
                                   nelec_per_nmgy=800.0)
        gen_images_fast(images, truth, seed=seed)
        return images, truth

    fields = []
    for f in range(M):
        images, truth = make_field(SEED + 1000 * f)
        catalog, det_boxes = detect_sources(images, thresh=6.0,
                                            boxsize=(SIZE, SIZE),
                                            match_radius_deg=1.0)
        active = (R.detection_active_boxes(catalog, det_boxes, images)
                  if catalog else None)
        fields.append({"catalog": catalog, "images": images,
                       "active_boxes": active})

    states, classes, isolated = R._merged_states_classes(
        fields, Config(), 8, 42)
    print(f"fields={M} constrained={sum(len(c) for c in classes)} "
          f"classes={len(classes)} isolated={len(isolated)}")

    captured = {}

    def fake_program(vps, elbos, conv, iters, buckets, c_real, **kw):
        captured.setdefault("buckets", buckets)
        z = np.zeros(())
        return (vps, elbos, conv, iters, z, z, z, z, z)

    def fake_wide(vps, elbos, conv, iters, wide, **kw):
        captured.setdefault("wide", wide)
        z = np.zeros(())
        return (vps, elbos, conv, iters, z, z, z, z, z)

    F_prog, F_wide = F._fused_joint_program, F._fused_wide_pass
    F._fused_joint_program, F._fused_wide_pass = fake_program, fake_wide
    try:
        cfg = Config()
        ncfg = R._platform_newton_config(R.NewtonConfig())
        step_cfg = R._capped_step_config(ncfg, cfg)
        restart_cfg = R._probe_config(ncfg, cfg)
        polish_cfg, n_polish = R._polish_config(ncfg, cfg)
        F._fused_joint_dispatch(states, classes, step_cfg,
                                n_sweeps=cfg.num_joint_vi_iters,
                                n_restart=1, restart_config=restart_cfg,
                                polish_config=polish_cfg, n_polish=n_polish)
    finally:
        F._fused_joint_program, F._fused_wide_pass = F_prog, F_wide

    def phase_stats(name, rows):
        """rows: list of (real_lanes, width, lane_total, sum_real_cnt,
        weight) — weight = relative number of passes this row executes."""
        lane_px = real_px = real_lane_px = 0.0
        for r, W, lt, cnt_sum, wgt in rows:
            lane_px += wgt * W * lt
            real_px += wgt * cnt_sum
            real_lane_px += wgt * r * lt
        fill_lane = real_lane_px / lane_px if lane_px else 1.0
        fill_mask = real_px / real_lane_px if real_lane_px else 1.0
        print(f"{name:18s} lane-fill {fill_lane:.3f} x mask-fill "
              f"{fill_mask:.3f} = util ceiling {real_px / lane_px:.3f} "
              f"(lane-px {lane_px / 1e6:.1f}M)")
        return lane_px, real_px

    n_sweeps = Config().num_joint_vi_iters
    cls_rows = []
    for bk in captured["buckets"]:
        lv = np.asarray(bk["lane_valid"])      # (C, W)
        cnt = np.asarray(bk["pix_counts"])     # (C, W)
        has = np.asarray(bk["has"])
        lt = float(np.prod(np.asarray(bk["patches"].mask.shape[1:])))
        for c in range(lv.shape[0]):
            if not has[c]:
                continue
            r = float(lv[c].sum())
            cls_rows.append((r, lv.shape[1], lt,
                             float((cnt[c] * lv[c]).sum()), n_sweeps + 2))
    wide_rows = []
    for bw in captured["wide"]:
        lv = np.asarray(bw["lane_valid"])      # (W,)
        cnt = np.asarray(bw["pix_counts"])
        lt = float(np.prod(np.asarray(bw["patches"].mask.shape[1:])))
        wide_rows.append((float(lv.sum()), lv.shape[0], lt,
                          float((cnt * lv).sum()), 1.0))

    a = phase_stats(f"class GS x{n_sweeps + 2}", cls_rows)
    b = phase_stats("wide probe x1", wide_rows)

    # isolated: compacted pow2 chunks per tile bucket, lane-fill ~1 for the
    # big chunks; estimate mask fill from the same per-source pixel counts
    iso_rows = []
    tile_of, cnts = {}, {}
    offsets = np.cumsum([0] + [len(st.catalog) for st in states])
    for f, st in enumerate(states):
        o = int(offsets[f])
        for s in st.targets:
            tile_of[o + s] = int(st.tile[s])
    by_t = {}
    for m in isolated:
        by_t.setdefault(tile_of[m], []).append(m)
    for t, ms in by_t.items():
        # staging uses per-source masked counts; approximate with the
        # class-table mean mask fill at this tile
        sel = [row for row in cls_rows + wide_rows]
        iso_rows.append((len(ms), max(32, 1 << (len(ms) - 1).bit_length()),
                         1.0, len(ms) * 1.0, 1.0))
    lane_px, _ = phase_stats("isolated (lane only)", iso_rows)

    tot_lane = a[0] + b[0]
    tot_real = a[1] + b[1]
    print(f"\nfused schedule total: util ceiling {tot_real / tot_lane:.3f} "
          f"(class share {a[0] / tot_lane:.2f}, wide {b[0] / tot_lane:.2f})")


if __name__ == "__main__":
    main()
