"""Host data-pipeline throughput: can the loader keep the chip fed?

The reference's known input bottleneck is ``ScannetQADataset`` — per-rank
multi-GB scene loads and per-sample numpy work inside ``__getitem__``
(``lib/dataset.py:155-816``), overlapped only by ``DataLoader`` workers.
This measures our equivalent (``data/pipeline.BatchIterator``: thread pool +
prefetch queue, native C++ vote kernel) at production settings — 40k-point
sampling, box-consistent augmentation, votes-after-augmentation, 480x480
view fetch — and reports samples/s to compare against the train step's
consumption rate (bench.py ``train_samples_per_sec``).

Synthetic scenes stand in for ScanNet npys (none in this environment): the
per-sample numpy work (sampling, augmentation, vote build, tokenize) is the
real production code path; only the disk/jpeg-decode cost of real data is
absent (the synthetic 480^2 view is drawn from numpy RNG instead).

Usage: python scripts/profile_loader.py [--batch 16] [--num_workers 4]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument("--num_points", type=int, default=40000)
    ap.add_argument("--image_size", type=int, default=480)
    ap.add_argument("--min_samples", type=int, default=192,
                    help="measure until at least this many samples drawn")
    cli = ap.parse_args(argv)

    from bridgeqa_tpu.data.pipeline import BatchIterator
    from scripts import common, train as train_script

    args = train_script.parse_args([
        "--synthetic", "--batch_size", str(cli.batch),
        # long synthetic epochs: the production ScanQA train split is ~25k
        # samples, so steady-state (not epoch-restart) throughput is the
        # representative number
        "--synthetic_records", str(max(cli.min_samples * 2, 256)),
        "--num_points", str(cli.num_points), "--image_size", str(cli.image_size),
        "--num_workers", str(cli.num_workers),
    ])
    datasets, _, _, _ = common.build_datasets(args, splits=("train",))
    ds = datasets["train"]

    loader = BatchIterator(ds, cli.batch, shuffle=True, seed=0,
                           num_workers=cli.num_workers)

    # warm one epoch pass-through to populate scene caches / thread pool
    warm = next(iter(loader))
    n_keys = len(warm)

    drawn = 0
    t0 = time.perf_counter()
    while drawn < cli.min_samples:
        for batch in loader:
            drawn += len(batch["scene_id_str"])
            if drawn >= cli.min_samples:
                break
    dt = time.perf_counter() - t0
    sps = drawn / dt

    print(json.dumps({
        "metric": "loader samples/sec (host pipeline, synthetic scenes)",
        "samples_per_sec": round(sps, 2),
        "batch": cli.batch,
        "num_workers": cli.num_workers,
        "host_cpus": os.cpu_count(),
        "num_points": cli.num_points,
        "image_size": cli.image_size,
        "batch_keys": n_keys,
        "note": "production __getitem__ path (40k sampling, augmentation, native "
                "vote kernel, 480^2 view, tokenize); synthetic scenes, so real "
                "disk/jpeg decode is excluded and the view is RNG-generated",
    }))
    return sps


if __name__ == "__main__":
    main()
