"""Learned frame-to-frame association (Trackastra-class linking;
reference multi_dimensional_segmentation.py:29-35,570-603)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_linker():
    from micro_sam_tpu.learned_tracking import train_default_linker

    return train_default_linker(n_sequences=4, n_steps=400, seed=7)


def _link_accuracy(tracker, images, segs, gt_links):
    """Fraction of ground-truth links the tracker recovers."""
    node_to_track, _ = tracker.link(segs, images)
    correct = total = 0
    for t, links in enumerate(gt_links):
        for child, parent in links.items():
            if (t + 1, child) not in node_to_track or (t, parent) not in node_to_track:
                continue
            total += 1
            if node_to_track[(t + 1, child)] == node_to_track[(t, parent)]:
                correct += 1
    assert total > 0
    return correct / total


def test_linker_learns_association(trained_linker):
    from micro_sam_tpu.learned_tracking import (
        LearnedTracker, synthetic_tracking_sequence,
    )

    # held-out sequence (seed outside the training range)
    images, segs, gt_links = synthetic_tracking_sequence(
        n_frames=8, n_objects=6, division_prob=0.0, seed=100)
    tracker = LearnedTracker(trained_linker)
    acc = _link_accuracy(tracker, images, segs, gt_links)
    assert acc > 0.9, f"learned linking accuracy {acc}"


def test_track_returns_consistent_ids(trained_linker):
    from micro_sam_tpu.learned_tracking import (
        LearnedTracker, synthetic_tracking_sequence,
    )

    images, segs, _ = synthetic_tracking_sequence(
        n_frames=6, n_objects=4, division_prob=0.0, seed=55)
    tracker = LearnedTracker(trained_linker)
    tracked, parent_graph = tracker.track(images, segs)
    assert tracked.shape == segs.shape
    # no divisions: every frame carries the same number of track ids, and the
    # set of ids is stable over time
    ids0 = set(np.unique(tracked[0])) - {0}
    for t in range(1, 6):
        assert (set(np.unique(tracked[t])) - {0}) == ids0


def test_division_recorded_in_parent_graph(trained_linker):
    from micro_sam_tpu.learned_tracking import (
        LearnedTracker, synthetic_tracking_sequence,
    )

    # high division probability guarantees at least one division event
    images, segs, gt_links = synthetic_tracking_sequence(
        n_frames=8, n_objects=5, division_prob=0.35, seed=11)
    n_divisions = sum(
        1 for links in gt_links
        for p in set(links.values()) if list(links.values()).count(p) > 1)
    assert n_divisions > 0, "synthetic seed produced no divisions"

    tracker = LearnedTracker(trained_linker, division_threshold=0.0)
    _, parent_graph = tracker.link(segs, images)
    assert len(parent_graph) > 0, "no divisions recovered"


def test_save_load_round_trip(trained_linker, tmp_path):
    from micro_sam_tpu.learned_tracking import (
        LearnedTracker, load_linker, save_linker, synthetic_tracking_sequence,
    )

    path = str(tmp_path / "linker.npz")
    save_linker(path, trained_linker)
    reloaded = load_linker(path)
    images, segs, _ = synthetic_tracking_sequence(n_frames=4, seed=3)
    a = LearnedTracker(trained_linker).link(segs, images)
    b = LearnedTracker(reloaded).link(segs, images)
    assert a == b

    # from_pretrained with a file path
    t = LearnedTracker.from_pretrained(path)
    assert t.link(segs, images) == a


def test_track_across_frames_with_learned_tracker(trained_linker):
    from micro_sam_tpu.learned_tracking import (
        LearnedTracker, synthetic_tracking_sequence,
    )
    from micro_sam_tpu.multi_dimensional_segmentation import track_across_frames

    images, segs, _ = synthetic_tracking_sequence(
        n_frames=5, n_objects=4, division_prob=0.0, seed=21)
    tracked, lineages = track_across_frames(
        images, segs, verbose=False, tracker=LearnedTracker(trained_linker))
    assert tracked.shape == segs.shape
    assert len(lineages) > 0
    # tracks persist across all frames
    for t in range(1, 5):
        assert len(set(np.unique(tracked[t])) - {0}) == \
            len(set(np.unique(tracked[0])) - {0})


def test_packaged_tracker_on_hela_like():
    """The shipped weights (assets/learned_tracker.npz) must track held-out
    HeLa-like deformable-cell sequences: link F1 >= 0.9, and divisions must
    beat the greedy overlap linker on fast small objects (where overlap
    linking has nothing to match)."""
    import os
    import numpy as np
    from micro_sam_tpu import learned_tracking as lt

    assert os.path.exists(lt._PACKAGED_WEIGHTS), "packaged weights missing"
    tracker = lt.LearnedTracker.from_pretrained("general_2d")

    images, segs, gt = lt.hela_like_tracking_sequence(
        n_frames=10, n_cells=5, division_prob=0.05, seed=4242)
    scores = lt.evaluate_tracking(segs, gt, *tracker.link(segs, images))
    assert scores["link_f1"] >= 0.9, scores

    div_learned, div_greedy = [], []
    for k in range(3):
        images, segs, gt = lt.synthetic_tracking_sequence(
            n_frames=10, n_objects=6, division_prob=0.08, seed=5300 + k)
        div_learned.append(lt.evaluate_tracking(
            segs, gt, *tracker.link(segs, images))["division_f1"])
        div_greedy.append(lt.evaluate_tracking(
            segs, gt, *lt.greedy_node_to_track(segs))["division_f1"])
    assert np.mean(div_learned) > np.mean(div_greedy), (div_learned, div_greedy)


def test_adversarial_regimes_no_false_bridging():
    """Occlusion reappearances and births must start NEW tracks — linking
    them to a pre-existing track is a false positive (doc/tracking_robustness.md)."""
    from micro_sam_tpu import learned_tracking as lt

    tracker = lt.LearnedTracker.from_pretrained("default")
    for kw in (dict(occlusion_prob=0.1, occlusion_len=2),
               dict(birth_prob=0.6, death_prob=0.08)):
        images, segs, links, events = lt.hela_like_tracking_sequence(
            n_frames=8, seed=11, drift_scale=2.0, return_events=True, **kw)
        reappearances = events["occlusions"] + events["births"]
        assert reappearances, "regime generated no events"
        for n2t in (tracker.link(segs, images)[0],
                    lt.greedy_node_to_track(segs)[0]):
            first_seen = {}
            for (t, oid), trk in n2t.items():
                first_seen[trk] = min(first_seen.get(trk, t), t)
            for (t, oid) in reappearances:
                trk = n2t.get((t, int(oid)))
                if trk is not None:
                    assert first_seen[trk] == t, \
                        f"event object {oid}@{t} bridged into track {trk}"


def test_confidence_gated_fallback():
    """Out-of-regime motion (drift far beyond training) must lower the
    learned linker's confidence; the auto mode then selects greedy. In-regime
    sequences keep high confidence and never fall back."""
    import numpy as np
    from micro_sam_tpu import learned_tracking as lt

    tracker = lt.LearnedTracker.from_pretrained("default")

    confs_in, confs_out = [], []
    for s in range(3):
        _, segs, _ = lt.hela_like_tracking_sequence(
            n_frames=8, seed=40 + s, drift_scale=1.0)
        tracker.link(segs)
        confs_in.append(tracker.last_confidence)
        _, segs, _ = lt.hela_like_tracking_sequence(
            n_frames=8, seed=40 + s, drift_scale=16.0)
        tracker.link(segs)
        confs_out.append(tracker.last_confidence)
    assert min(confs_in) > max(confs_out), (confs_in, confs_out)
    assert min(confs_in) > tracker.MIN_CONFIDENCE, confs_in

    # auto mode: an in-regime churn sequence selects the learned linker with
    # high confidence; a forced high threshold flips it to greedy
    images, segs, _ = lt.hela_like_tracking_sequence(
        n_frames=6, seed=44, drift_scale=2.0, birth_prob=0.5, death_prob=0.06)
    choice, signals = lt.choose_linker(segs)
    assert choice == "learned", signals
    _, _, used = tracker.track_with_fallback(images, segs)
    assert not used
    _, _, used = tracker.track_with_fallback(images, segs, min_confidence=1.1)
    assert used

    # regime-aware selection: stable slow scenes and heavy drift pick greedy
    # outright, small objects pick learned
    _, segs_slow, _ = lt.hela_like_tracking_sequence(
        n_frames=6, seed=44, drift_scale=1.0)
    assert lt.choose_linker(segs_slow)[0] == "greedy"
    _, segs_fast, _ = lt.hela_like_tracking_sequence(
        n_frames=6, seed=44, drift_scale=8.0)
    assert lt.choose_linker(segs_fast)[0] == "greedy"
    _, segs_small, _ = lt.synthetic_tracking_sequence(seed=1)
    assert lt.choose_linker(np.asarray(segs_small))[0] == "learned"


def test_track_across_frames_auto_mode():
    from micro_sam_tpu import learned_tracking as lt
    from micro_sam_tpu.multi_dimensional_segmentation import track_across_frames

    images, segs, _ = lt.hela_like_tracking_sequence(
        n_frames=6, seed=5, drift_scale=1.0)
    tracked, lineages = track_across_frames(
        images, segs, tracker="auto", verbose=False)
    assert tracked.shape == segs.shape
    assert (tracked[segs > 0] > 0).all()
