"""MetricLogger CSV-sink tests (scrubvae_tpu/utils/logging.py).

The reference logs only to wandb (trainer.py:514); the CSV sink is this
framework's hermetic replacement, so its resume semantics need pinning:
a resumed run (model.load_model + start_epoch) must PRESERVE pre-resume
rows even when the metric schema grows mid-run (the first val epoch after
resume adds *_test columns, which triggers the union-header rewrite)."""

import csv

from scrubvae_tpu.utils.logging import MetricLogger


def read_rows(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


class TestMetricLogger:
    def test_schema_growth_rewrites_with_union_header(self, tmp_path):
        lg = MetricLogger(tmp_path)
        lg.log({"a_train": 1.0}, epoch=1)
        lg.log({"a_train": 2.0, "a_test": 3.0}, epoch=2)
        rows = read_rows(tmp_path / "metrics.csv")
        assert [r["epoch"] for r in rows] == ["1", "2"]
        assert rows[0]["a_test"] == ""  # union header backfills empty
        assert rows[1]["a_test"] == "3.0"

    def test_resume_preserves_history_across_schema_growth(self, tmp_path):
        # first process: train rows then an eval row (full schema)
        lg = MetricLogger(tmp_path)
        for e in range(1, 4):
            lg.log({"a_train": float(e)}, epoch=e)
        lg.log({"a_train": 4.0, "a_test": 9.0}, epoch=4)

        # resumed process: train-only rows first, then schema grows again
        lg2 = MetricLogger(tmp_path, resume=True)
        assert lg2.history["epoch"][-1] == 4
        lg2.log({"a_train": 5.0}, epoch=5)
        lg2.log({"a_train": 6.0, "a_test": 10.0, "b_test": 1.0}, epoch=6)

        rows = read_rows(tmp_path / "metrics.csv")
        assert [r["epoch"] for r in rows] == ["1", "2", "3", "4", "5", "6"]
        assert rows[3]["a_test"] == "9.0"  # pre-resume eval row intact
        assert rows[5]["b_test"] == "1.0"
        # epoch column survives the round-trip as integers, not "4.0"
        assert all("." not in r["epoch"] for r in rows)

    def test_fresh_run_truncates_stale_file(self, tmp_path):
        lg = MetricLogger(tmp_path)
        lg.log({"a_train": 1.0}, epoch=1)
        lg.log({"a_train": 2.0}, epoch=2)
        # re-run the same config from scratch (no resume): old rows go
        lg2 = MetricLogger(tmp_path)
        assert lg2.history == {}
        lg2.log({"a_train": 7.0}, epoch=1)
        rows = read_rows(tmp_path / "metrics.csv")
        assert [r["epoch"] for r in rows] == ["1"]
        assert rows[0]["a_train"] == "7.0"

    def test_fresh_run_history_is_float_typed(self, tmp_path):
        lg = MetricLogger(tmp_path)
        lg.log({"total_train": 1.5}, epoch=1)
        lg2 = MetricLogger(tmp_path, resume=True)
        assert lg2.history["total_train"] == [1.5]
        assert isinstance(lg2.history["total_train"][0], float)

    def test_readonly_construction_never_deletes_history(self, tmp_path):
        """ADVICE r4 (high): export/eval/bench tools construct Trainer
        against REAL run dirs with resume=False; the stale-file truncation
        must be deferred to the first log() so those read-only
        constructions never delete a trained run's metrics history."""
        lg = MetricLogger(tmp_path)
        lg.log({"a_train": 1.0}, epoch=1)
        # tool-style construction: never logs
        MetricLogger(tmp_path)
        rows = read_rows(tmp_path / "metrics.csv")
        assert [r["epoch"] for r in rows] == ["1"]
        # a second fresh construction that DOES log still truncates
        lg3 = MetricLogger(tmp_path)
        lg3.log({"a_train": 9.0}, epoch=1)
        rows = read_rows(tmp_path / "metrics.csv")
        assert [r["epoch"] for r in rows] == ["1"]
        assert rows[0]["a_train"] == "9.0"

    def test_resume_drops_rows_beyond_start_epoch(self, tmp_path):
        """ADVICE r4 (low): resuming from an EARLIER checkpoint than the
        last logged epoch must drop the stale future-epoch rows so the
        re-logged epochs don't conflict with leftovers."""
        lg = MetricLogger(tmp_path)
        for e in range(1, 8):
            lg.log({"a_train": float(e)}, epoch=e)
        # resume from epoch 5: rows 6,7 are stale
        lg2 = MetricLogger(tmp_path, resume=True, start_epoch=5)
        assert lg2.history["epoch"] == [1, 2, 3, 4, 5]
        # dropped rows are rewritten out of the file immediately
        rows = read_rows(tmp_path / "metrics.csv")
        assert [r["epoch"] for r in rows] == ["1", "2", "3", "4", "5"]
        lg2.log({"a_train": 60.0}, epoch=6)
        rows = read_rows(tmp_path / "metrics.csv")
        assert [r["epoch"] for r in rows] == ["1", "2", "3", "4", "5", "6"]
        assert rows[-1]["a_train"] == "60.0"
