"""Experiment-artifact helpers preserving the reference's exact file
contract (reference train.py:22-45, SURVEY.md §5): results.json,
results.txt tee, loss-line formatting, source snapshotting."""

from __future__ import annotations

import glob
import json
import os
import shutil


def save_results(expr_dir: str, results_dict: dict):
    """-> results.json (reference train.py:22-26)."""
    fname = os.path.join(expr_dir, "results.json")
    with open(fname, "w") as f:
        json.dump(results_dict, f, indent=4)


def copy_scripts_to_folder(expr_dir: str, src_dir: str = None):
    """Snapshot the framework sources into the experiment dir
    (reference train.py:29-32 copied all *.py next to train.py)."""
    if src_dir is None:
        src_dir = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
    dst = os.path.join(expr_dir, "src_snapshot")
    os.makedirs(dst, exist_ok=True)
    for f in glob.glob(os.path.join(src_dir, "**", "*.py"), recursive=True):
        rel = os.path.relpath(f, src_dir)
        out = os.path.join(dst, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        shutil.copy(f, out)


def print_log(out_f, message: str):
    """tee to file + stdout (reference train.py:34-37)."""
    if out_f is not None:
        out_f.write(message + "\n")
        out_f.flush()
    print(message)


def format_log(epoch: int, i: int, errors: dict, t: float,
               prefix: bool = True) -> str:
    """Loss-line formatting (reference train.py:39-45)."""
    message = "(epoch: %d, iters: %d, time: %.3f) " % (epoch, i, t)
    if not prefix:
        message = " " * len(message)
    for k, v in errors.items():
        message += "%s: %.3f " % (k, float(v))
    return message
