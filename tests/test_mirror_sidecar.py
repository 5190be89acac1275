"""Weights-mirror gating of scripts/mirror_best_checkpoint.py.

The sidecar is the durability layer of the mode-coverage campaign
(RUNBOOK.md): results/ and /tmp are wiped by VM restarts, so the best
(G,D,Gs) snapshot is fp16-mirrored into the git tree. These tests pin the
refresh gates: min-gain hysteresis for ordinary improvements (each rewrite
grows git history by ~120 MB) and the unconditional north-star override —
a run peaking at >=997 must ALWAYS land its weights in-repo, even when the
gain over the previous mirror is below the hysteresis threshold.
"""

import importlib.util
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                      "mirror_best_checkpoint.py")


def _load_module():
    spec = importlib.util.spec_from_file_location("mirror_sidecar", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def sidecar():
    return _load_module()


def _fixture_run(root, kimg, count, kl=0.5):
    run_dir = os.path.join(root, "00000-mode-coverage")
    os.makedirs(run_dir, exist_ok=True)
    snap = {"g": {"w": np.ones((4, 4), np.float32)},
            "d": {"b": np.zeros(3, np.float64)},
            "step": np.int64(7)}
    with open(os.path.join(run_dir,
                           f"network-snapshot-{kimg:06d}.pkl"), "wb") as f:
        pickle.dump(snap, f)
    with open(os.path.join(run_dir, "metric-mode_counts_24k.txt"), "w") as f:
        f.write(f"network-snapshot-{kimg:06d}        time 1.0         "
                f"mode_counts_24k    {count} mode_counts_24k_KL     {kl}\n")
    return run_dir


def _run_once(tmp, stamp_count, eval_count, kimg=100, eval_kl=0.5,
              stamp_kl=0.5):
    """One --once pass against a fixture tree; → (refreshed, record_count)."""
    results = os.path.join(tmp, "results")
    art = os.path.join(tmp, "art")
    os.makedirs(art, exist_ok=True)
    _fixture_run(results, kimg, eval_count, kl=eval_kl)
    weights = os.path.join(art, "w.pkl")
    if stamp_count is not None:
        with open(weights + ".json", "w") as f:
            json.dump({"count": stamp_count, "kl": stamp_kl, "kimg": 1}, f)
        open(weights, "wb").close()
    out = subprocess.run(
        [sys.executable, SCRIPT, "--once",
         "--result-root", results,
         "--backup-dir", os.path.join(tmp, "bak"),
         "--record-file", os.path.join(art, "rec.json"),
         "--weights-file", weights],
        capture_output=True, text=True, check=True).stdout
    record = json.load(open(os.path.join(art, "rec.json")))
    return "weights-mirrored" in out, record["count"], weights


def test_record_updates_on_any_improvement(tmp_path):
    refreshed, rec, _ = _run_once(str(tmp_path), 962, 963)
    assert rec == 963          # durable metric record: every improvement
    assert not refreshed       # weights: below min-gain hysteresis


def test_weights_refresh_at_min_gain(tmp_path):
    refreshed, rec, weights = _run_once(str(tmp_path), 962, 972)
    assert refreshed and rec == 972
    snap = pickle.load(open(weights, "rb"))
    # fp16 cast + provenance stamp (restore_best_weights.py contract)
    assert snap["g"]["w"].dtype == np.float16
    assert snap["d"]["b"].dtype == np.float16
    assert snap["step"] == 7   # non-float leaves untouched
    assert snap["mirror_meta"]["count"] == 972
    stamp = json.load(open(weights + ".json"))
    assert stamp["count"] == 972


def test_north_star_overrides_min_gain(tmp_path):
    refreshed, rec, _ = _run_once(str(tmp_path), 990, 997)
    assert refreshed and rec == 997


def test_no_rewrite_without_improvement_at_target(tmp_path):
    refreshed, _, _ = _run_once(str(tmp_path), 997, 997)
    assert not refreshed


def test_kl_tiebreak_refreshes_at_target(tmp_path):
    """Past the north star, an equal-count snapshot with LOWER KL replaces
    the mirror (999 @602 KL 0.18 should supersede 999 @502 KL 0.28)."""
    refreshed, _, _ = _run_once(str(tmp_path), 997, 997,
                                eval_kl=0.2, stamp_kl=0.5)
    assert refreshed


def test_kl_tiebreak_ignored_below_target(tmp_path):
    """Below the target the min-gain hysteresis still rules: equal count +
    better KL alone must NOT trigger the expensive weights rewrite."""
    refreshed, _, _ = _run_once(str(tmp_path), 900, 900,
                                eval_kl=0.2, stamp_kl=0.5)
    assert not refreshed


def test_first_mirror_with_no_stamp(tmp_path):
    refreshed, rec, _ = _run_once(str(tmp_path), None, 600)
    assert refreshed and rec == 600


def test_git_commit_of_refreshed_mirror(tmp_path, sidecar, monkeypatch):
    # the weights mirror lives in a git repo: a refresh with --git-commit
    # semantics must land exactly the mirror files in a commit
    repo = tmp_path / "repo"
    art = repo / "artifacts"
    art.mkdir(parents=True)
    env = {"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
           "PATH": os.environ["PATH"], "HOME": str(tmp_path)}
    subprocess.run(["git", "init", "-q", str(repo)], check=True, env=env)
    w = art / "best.pkl"
    w.write_bytes(b"x")
    stamp = art / "best.pkl.json"
    stamp.write_text("{}")
    unrelated = repo / "scratch.txt"          # must NOT be swept in
    unrelated.write_text("wip")
    for k, v in env.items():  # undone after the test (no HOME/GIT_* leaks)
        monkeypatch.setenv(k, v)
    sidecar.commit_mirrors([str(w), str(stamp), str(art / "missing.json")],
                           973, 412.0)
    log = subprocess.run(["git", "-C", str(repo), "log", "--oneline",
                          "--name-only"], capture_output=True, text=True,
                         env=env).stdout
    assert "973/1000 modes @ 412 kimg" in log
    assert "best.pkl" in log and "scratch.txt" not in log
    status = subprocess.run(["git", "-C", str(repo), "status", "--short"],
                            capture_output=True, text=True, env=env).stdout
    assert "scratch.txt" in status            # left untracked, uncommitted
