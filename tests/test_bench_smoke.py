"""bench.py plumbing guard: the driver runs ``python bench.py`` on the real
chip at the end of every round — a plumbing regression there would record a
failed benchmark. ``--smoke`` runs the identical code path (model build with
the height channel, rank scan, every roofline sub-phase, JSON assembly) at
CPU-runnable dims."""

import io
import json
import sys


def test_bench_smoke_prints_one_json_line():
    import bench

    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        bench.main(smoke=True)
    finally:
        sys.stdout = old
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1, lines
    payload = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline", "scoring_pass_ms",
                "vit_ms", "detector_ms", "mfu_scoring", "mbu_scoring", "mfu_vit",
                "train_step_ms", "train_samples_per_sec"):
        assert key in payload, key
    assert payload["train_samples_per_sec"] > 0
    assert payload["smoke"] is True
    assert payload["value"] > 0
