"""Experiment-artifact helpers preserving the reference's exact file
contract (reference train.py:22-45, SURVEY.md §5): results.json,
results.txt tee, loss-line formatting, source snapshotting."""

from __future__ import annotations

import glob
import json
import os
import shutil


def save_results(expr_dir: str, results_dict: dict):
    """-> results.json (reference train.py:22-26).

    Written atomically: this file is rewritten every eval, and a crash
    mid-write would otherwise leave truncated JSON that bricks the
    --continue_train resume path."""
    fname = os.path.join(expr_dir, "results.json")
    tmp = fname + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results_dict, f, indent=4)
    os.replace(tmp, fname)


def copy_scripts_to_folder(expr_dir: str, src_dir: str = None):
    """Snapshot the framework sources into the experiment dir.

    The reference (train.py:29-32) copies its flat directory of *.py files
    straight into expr_dir, leaving a runnable-in-place snapshot with
    sources at the expr_dir root.  The package-shaped equivalent here:
    the package's top-level modules land flat in expr_dir (*.py at the
    root, the reference layout) and subpackages keep their tree beside
    them, so ``expr_dir`` is importable as a snapshot the same way.
    """
    if src_dir is None:
        src_dir = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
    for f in glob.glob(os.path.join(src_dir, "*.py")):
        shutil.copy(f, expr_dir)
    for f in glob.glob(os.path.join(src_dir, "*", "**", "*.py"),
                       recursive=True):
        rel = os.path.relpath(f, src_dir)
        out = os.path.join(expr_dir, rel)
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
