"""Harvest headline scalars from a tensorboard run directory.

The box wipes ``logs/`` between sessions, so training metrics must be copied
into ``docs/RESULTS_R3.md`` as they land (see that file's preamble). This tool
prints, for each requested tag (or a default headline set), the max and the
last few (step, value) pairs so the numbers can be persisted in one paste.

Usage:
    python tools/tb_harvest.py logs/tensorboard/open_drawer_ppo/expert_r3c_seed389 \
        [--tags Train/succ_rate_mean Eval/succ_rate_max] [--tail 8]
"""
from __future__ import annotations

import argparse
import glob
import os

DEFAULT_TAGS = [
    "Train/succ_rate_mean", "Train/succ_rate_max",
    "Val/succ_rate_mean", "Val/succ_rate_max",
    "Test/succ_rate_mean", "Test/succ_rate_max",
    "Train/is_reached_max", "Train/is_grasped_max",
    "Test/is_reached_max", "Test/is_grasped_max",
    "Train/reward_mean", "Train/dagger_loss",
]


def load_scalars(run_dir: str):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )
    acc = EventAccumulator(run_dir, size_guidance={"scalars": 0})
    acc.Reload()
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--tags", nargs="*", default=None)
    ap.add_argument("--tail", type=int, default=6)
    args = ap.parse_args()

    run_dir = args.run_dir
    if not glob.glob(os.path.join(run_dir, "events.out.tfevents.*")):
        sub = glob.glob(os.path.join(run_dir, "*", ""))
        if sub:
            run_dir = max(sub, key=os.path.getmtime)
    acc = load_scalars(run_dir)
    avail = set(acc.Tags().get("scalars", []))
    tags = args.tags or [t for t in DEFAULT_TAGS if t in avail]
    if not tags:
        print(f"no requested tags found; available: {sorted(avail)}")
        return
    for tag in tags:
        if tag not in avail:
            print(f"{tag}: (absent)")
            continue
        ev = acc.Scalars(tag)
        if not ev:
            print(f"{tag}: n=0")
            continue
        mx = max(ev, key=lambda e: e.value)
        tail = ev[-args.tail:]
        tail_s = " ".join(f"{e.step}:{e.value:.4g}" for e in tail)
        print(f"{tag}: n={len(ev)} max={mx.value:.4g}@{mx.step} tail[{tail_s}]")


if __name__ == "__main__":
    main()
