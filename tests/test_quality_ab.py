"""Unit tests for the quality-at-speed A/B overlay logic
(tools/quality_ab.py — VERDICT r3 #3 harness).

Pure-Python: exercises the NaN conventions and the seed-noise verdict on
hand-built metric curves, no JAX/training involved."""

import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))

from quality_ab import overlay, summarize, tail_stats  # noqa: E402

NAN = float("nan")


def curves(**kw):
    """metric -> {epoch: value} shorthand to the read_metrics format."""
    return {k: sorted(v.items()) for k, v in kw.items()}


class TestOverlay:
    def test_tail_window_applies_to_train_curves_only(self):
        a = curves(x_train={e: 1.0 for e in range(1, 11)},
                   x_test={5: 1.0, 10: 1.0})
        b = curves(x_train={**{e: 2.0 for e in range(1, 6)},
                            **{e: 1.0 for e in range(6, 11)}},
                   x_test={5: 3.0, 10: 1.0})
        s = overlay(a, b, tail=5)
        # train: last-5 window (epochs 6-10) agrees exactly
        assert s["x_train"]["epochs_compared"] == 5
        assert s["x_train"]["max_rel_diff"] == 0.0
        # test metrics: ALL common epochs compared (epoch 5 diverges)
        assert s["x_test"]["epochs_compared"] == 2
        assert s["x_test"]["max_rel_diff"] > 0.5

    def test_nan_in_both_is_agreement_nan_in_one_is_divergence(self):
        a = curves(m_test={1: NAN, 2: NAN, 3: 1.0})
        b = curves(m_test={1: NAN, 2: 5.0, 3: 1.0})
        s = overlay(a, b, tail=10)
        # epoch1 NaN/NaN -> 0, epoch2 NaN/5.0 -> 1, epoch3 equal -> 0
        assert s["m_test"]["max_rel_diff"] == 1.0
        assert abs(s["m_test"]["mean_rel_diff"] - 1 / 3) < 1e-12

    def test_summary_stays_strict_json(self):
        a = curves(m_test={1: NAN})
        b = curves(m_test={1: NAN})
        s = overlay(a, b, tail=10)
        assert s["m_test"]["last_a"] is None  # not NaN
        import json

        json.dumps(s)  # strict JSON serializable

    def test_disjoint_epochs_skipped(self):
        a = curves(m_train={1: 1.0})
        b = curves(m_train={2: 1.0})
        assert overlay(a, b, tail=10) == {}


class TestSummarizeVerdict:
    def _runs(self, ab_diff, noise_diff):
        base = curves(m_train={e: 100.0 for e in range(1, 6)})
        ref = curves(m_train={e: 100.0 * (1 + ab_diff) for e in range(1, 6)})
        seed = curves(
            m_train={e: 100.0 * (1 + noise_diff) for e in range(1, 6)}
        )
        return {"default": base, "ref_storage": ref, "default_seed1": seed}

    def test_within_noise_when_ab_below_seed_spread(self):
        s = summarize(self._runs(ab_diff=0.05, noise_diff=0.08), tail=5)
        assert s["verdict"]["m_train"]["within_noise"]
        assert s["within_noise_count"] == 1

    def test_exceeds_noise_when_ab_above_seed_spread_plus_floor(self):
        s = summarize(self._runs(ab_diff=0.10, noise_diff=0.01), tail=5)
        assert not s["verdict"]["m_train"]["within_noise"]

    def test_small_floor_tolerates_sub_2pct_ab_on_quiet_metrics(self):
        s = summarize(self._runs(ab_diff=0.015, noise_diff=0.0), tail=5)
        assert s["verdict"]["m_train"]["within_noise"]

    def test_tail_stats_window_and_nan_drop(self):
        runs = {
            "a": curves(m_train={1: 10.0, 2: 20.0, 3: 30.0, 4: NAN}),
        }
        s = tail_stats(runs, lo=2, hi=4)
        assert s["a"]["m_train"]["n"] == 2  # epoch 1 outside, epoch 4 NaN
        assert s["a"]["m_train"]["mean"] == 25.0
        assert s["a"]["m_train"]["std"] > 0

    def test_no_noise_arm_no_verdict(self):
        runs = self._runs(0.05, 0.0)
        del runs["default_seed1"]
        s = summarize(runs, tail=5)
        assert "verdict" not in s and "seed_noise" not in s
        assert "m_train" in s["metrics"]

    def test_arbitrary_arm_subset_does_not_crash(self):
        """ADVICE r4 (medium): summarize() must not KeyError when the
        canonical default/ref_storage arms are absent from --arms."""
        base = curves(m_train={e: 100.0 for e in range(1, 6)})
        seed = curves(m_train={e: 101.0 for e in range(1, 6)})
        s = summarize({"default": base, "default_seed1": seed}, tail=5)
        # seed-only subset: noise computed, generic fallback comparison
        assert "seed_noise" in s
        assert "m_train" in s["metrics"]
        s2 = summarize(
            {"ref_storage": base, "ref_storage_seed1": seed}, tail=5
        )
        assert "f32_seed_noise" in s2

    def test_three_seed_noise_floor_is_max_pairwise(self):
        """VERDICT r4 #7: with three seed replicates the floor is the max
        over the 3 pairwise spreads, not just seed0-vs-seed1."""
        mk = lambda v: curves(m_train={e: v for e in range(1, 6)})
        runs = {
            "default": mk(100.0),
            "default_seed1": mk(101.0),   # 1% from seed0
            "default_seed2": mk(106.0),   # ~6% from seed0, 5% from seed1
            "ref_storage": mk(104.0),     # 4% A/B divergence
        }
        s = summarize(runs, tail=5)
        assert s["seed_noise"]["m_train"]["n_pairs"] == 3
        # floor = max pairwise ~= 6% > 4% A/B -> within noise
        assert s["seed_noise"]["m_train"]["mean_rel_diff"] > 0.05
        assert s["verdict"]["m_train"]["within_noise"]

    def test_deviation_arms_get_their_own_verdicts(self):
        """VERDICT r4 #3: sigma_rank256/diag_cov arms are compared against
        the default baseline with verdicts vs the default-numerics floor."""
        mk = lambda v: curves(m_train={e: v for e in range(1, 6)})
        runs = {
            "default": mk(100.0),
            "default_seed1": mk(103.0),
            "sigma_rank256": mk(101.0),
            "diag_cov": mk(130.0),
        }
        s = summarize(runs, tail=5)
        assert s["verdicts"]["sigma_rank256"]["m_train"]["within_noise"]
        assert not s["verdicts"]["diag_cov"]["m_train"]["within_noise"]
