"""Box-farming work queue: atomic claims, resume, failure retry
(the reference's taskfarmer/Dtree layer, contrib/nersc + SURVEY.md §5)."""

import numpy as np
import pytest

from celeste_jl_tpu.io.dataset import BoundingBox
from celeste_jl_tpu.parallel.multinode import (
    FileWorkQueue, box_name, run_worker, split_box)
from celeste_jl_tpu.parallel.run import OptimizedSource


def _fake_result():
    return OptimizedSource(init_pos=np.zeros(2), vs=np.zeros(44),
                           elbo=-1.0, converged=True, is_sky_bad=False)


def test_split_box_grid():
    box = BoundingBox(0.0, 1.0, 10.0, 12.0)
    subs = split_box(box, 2, 4)
    assert len(subs) == 8
    # cover the full box without overlap
    assert min(b.ramin for b in subs) == 0.0
    assert max(b.ramax for b in subs) == 1.0
    assert min(b.decmin for b in subs) == 10.0
    assert max(b.decmax for b in subs) == 12.0
    areas = sum((b.ramax - b.ramin) * (b.decmax - b.decmin) for b in subs)
    assert areas == pytest.approx(2.0)


def test_claim_is_exclusive(tmp_path):
    boxes = split_box(BoundingBox(0, 1, 0, 1), 2, 1)
    q = FileWorkQueue(str(tmp_path), boxes)
    assert q.try_claim(boxes[0], "w1") == 1
    assert q.try_claim(boxes[0], "w2") is None      # already claimed
    assert q.try_claim(boxes[1], "w2") == 1


def test_worker_completes_all_and_resume(tmp_path):
    boxes = split_box(BoundingBox(0, 1, 0, 1), 2, 2)
    q = FileWorkQueue(str(tmp_path), boxes)

    done = run_worker(q, load_images=lambda b: [],
                      infer=lambda images, box: [_fake_result()])
    assert done == 4
    assert q.pending() == []
    # resume: nothing left to do, results are not recomputed
    done2 = run_worker(q, load_images=lambda b: [],
                       infer=lambda images, box: [_fake_result()])
    assert done2 == 0


def test_two_workers_share_the_queue(tmp_path):
    boxes = split_box(BoundingBox(0, 1, 0, 1), 3, 1)
    q1 = FileWorkQueue(str(tmp_path), boxes)
    q2 = FileWorkQueue(str(tmp_path))          # second worker, same dir
    n1 = run_worker(q1, load_images=lambda b: [],
                    infer=lambda i, b: [_fake_result()], max_boxes=1)
    n2 = run_worker(q2, load_images=lambda b: [],
                    infer=lambda i, b: [_fake_result()])
    assert n1 == 1 and n2 == 2
    assert q1.pending() == []


def test_failed_box_is_retried_then_abandoned(tmp_path):
    boxes = split_box(BoundingBox(0, 1, 0, 1), 1, 1)
    q = FileWorkQueue(str(tmp_path), boxes, max_attempts=2)
    calls = []

    def failing_infer(images, box):
        calls.append(1)
        raise RuntimeError("bad box")

    done = run_worker(q, load_images=lambda b: [], infer=failing_infer)
    assert done == 0
    assert len(calls) == 2                      # retried max_attempts times
    assert q.try_claim(boxes[0], "w") is None   # exhausted
    assert len(q.pending()) == 1                # surfaced as not-done


def test_failure_then_success(tmp_path):
    boxes = split_box(BoundingBox(0, 1, 0, 1), 1, 1)
    q = FileWorkQueue(str(tmp_path), boxes, max_attempts=3)
    state = {"n": 0}

    def flaky_infer(images, box):
        state["n"] += 1
        if state["n"] == 1:
            raise RuntimeError("transient")
        return [_fake_result()]

    done = run_worker(q, load_images=lambda b: [], infer=flaky_infer)
    assert done == 1
    assert q.done(boxes[0])


def test_box_name_roundtrip_is_stable():
    b = BoundingBox(12.3456, 12.5, -1.25, -1.0)
    assert box_name(b) == "12.3456-12.5000--1.2500--1.0000"


def test_pipelined_worker_drains_queue_end_to_end(tmp_path):
    """run_worker_pipelined: claims boxes in groups, streams them through
    the fused multi-field pipeline (load+detect of group k+1 overlapping
    group k's launch), saves every box's results, and resumes to nothing."""
    from celeste_jl_tpu.parallel.multinode import run_worker_pipelined
    from celeste_jl_tpu.synthetic import (gen_images, make_blank_images,
                                          sample_galaxy, sample_star)
    from celeste_jl_tpu.utils.config import Config

    # 3 synthetic "boxes" (RA strips 16 wide), each its own little field
    # (identity WCS: world coords = pixel coords); both of a box's sources
    # sit inside its strip so both are targets of that box
    def make_field(seed, cx):
        images = make_blank_images(H=48, W=48, sky_nmgy=0.05,
                                   nelec_per_nmgy=2000.0)
        truth = [sample_star(pos=(cx - 4.0, 14.0), r_flux=25.0),
                 sample_galaxy(pos=(cx + 4.0, 34.0), r_flux=35.0,
                               gal_radius_px=2.0)]
        gen_images(images, truth, seed=seed)
        return images

    boxes = split_box(BoundingBox(0.0, 48.0, 0.0, 48.0), 3, 1)
    fields = {box_name(b): make_field(7 + i, 8.0 + 16.0 * i)
              for i, b in enumerate(boxes)}
    q = FileWorkQueue(str(tmp_path), boxes)

    done = run_worker_pipelined(
        q, load_images=lambda b: fields[box_name(b)],
        config=Config(min_radius_pix=8.0), group_boxes=2,
        detect_kwargs=dict(thresh=6.0, boxsize=(48, 48),
                           match_radius_deg=1.0))
    assert done == 3
    assert q.pending() == []
    # every box found its 2 sources and the results round-trip
    for b in boxes:
        d = np.load(q._result_file(b))
        assert d["vs"].shape == (2, 44)
        assert np.all(np.isfinite(d["elbo"]))
    # resume: nothing left
    assert run_worker_pipelined(
        q, load_images=lambda b: fields[box_name(b)]) == 0
