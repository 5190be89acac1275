#!/usr/bin/env python3
"""Self-healing supervisor for the stacked-MNIST mode-coverage experiment.

Polls the active run's ``metric-mode_counts_24k.txt`` (written by the
in-training metric tick) and the trainer PID, and reacts:

  * **collapse** (mode count drops >``--drop-threshold`` below the run's
    OWN observed peak once that peak is past ``--min-peak``): cooperatively
    stops the run (``abort.txt``, the reference's own stop mechanism), waits
    for the ``_finished.txt`` sentinel, then relaunches
    ``scripts/exp_stacked_mode_coverage.py`` from the best-scoring snapshot
    at the SAME base knobs, staleness re-anchored to 1. Collapse is judged
    against the run's own peak, not the global best: a fresh or resumed run
    legitimately evals below the all-time peak early (measured 874-952 on
    the first post-resume eval, 433 on a from-scratch first eval), and the
    2026-08-19 ladder (d-lr /2 + rec x1.6 per relaunch, judged vs global
    962) burned four 30-min cycles without ever beating the base recipe.
  * **crash / silent exit** (PID gone without reaching total_kimg): relaunch
    from the latest checkpoint at the current escalation level.
  * **north star** (count >= ``--target``): logged; training continues (all
    snapshots are retained, so later collapse cannot lose the result).

Only ever one trainer process exists at a time (single-client rule for the
relay TPU): a relaunch happens strictly after the previous process exited.
State is kept in memory; the watchdog log is append-only in --result-root.
"""

import argparse
import os
import re
import subprocess
import sys
import time

METRIC_FILE = "metric-mode_counts_24k.txt"
LINE_RE = re.compile(
    r"network-snapshot-(\d+)\s+time\s+\S+\s+mode_counts_24k\s+(\d+)"
    r"(?:\s+mode_counts_24k_KL\s+([\d.]+))?")


def log(root, msg):
    line = f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(os.path.join(root, "watchdog.log"), "a") as f:
        f.write(line + "\n")


def read_metrics(run_dir):
    """→ list of (snapshot_kimg, count, kl) in file order."""
    path = os.path.join(run_dir, METRIC_FILE)
    if not os.path.isfile(path):
        return []
    out = []
    with open(path) as f:
        for ln in f:
            m = LINE_RE.search(ln)
            if m:
                out.append((int(m.group(1)), int(m.group(2)),
                            float(m.group(3)) if m.group(3) else None))
    return out


def _step_dirs(cdir):
    """Completed orbax step dirs only — in-progress saves appear as
    ``step_N.orbax-checkpoint-tmp-*`` and must be ignored (a poll racing a
    save crashed on int-parsing one)."""
    out = []
    for name in os.listdir(cdir):
        if name.startswith("step_") and name[len("step_"):].isdigit():
            out.append(name)
    return out


def checkpoint_for_kimg(run_dir, kimg):
    """Orbax step dir whose step//1000 == snapshot kimg, if present."""
    cdir = os.path.join(run_dir, "checkpoints")
    if not os.path.isdir(cdir):
        return None
    for name in sorted(_step_dirs(cdir), reverse=True):
        if int(name[len("step_"):]) // 1000 == kimg:
            return os.path.join(cdir, name)
    return None


def latest_checkpoint(run_dir):
    cdir = os.path.join(run_dir, "checkpoints")
    if not os.path.isdir(cdir):
        return None
    steps = _step_dirs(cdir)
    if not steps:
        return None
    return os.path.join(cdir, max(steps, key=lambda n: int(n[len("step_"):])))


def earlier_checkpoint(ckpt_path, steps_back=1):
    """The checkpoint ``steps_back`` snapshots before ``ckpt_path`` in the
    same run's checkpoints dir, or None if there is none."""
    cdir = os.path.dirname(ckpt_path)
    if not os.path.isdir(cdir):
        return None
    steps = sorted(n for n in os.listdir(cdir) if n.startswith("step_"))
    try:
        i = steps.index(os.path.basename(ckpt_path))
    except ValueError:
        return None
    if i - steps_back < 0:
        return None
    return os.path.join(cdir, steps[i - steps_back])


def pid_alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except (OSError, TypeError):
        return False


def newest_run_dir(result_root, desc_substr, after_ts):
    cands = []
    for name in os.listdir(result_root):
        full = os.path.join(result_root, name)
        if (os.path.isdir(full) and desc_substr in name
                and re.match(r"\d{5}-", name)
                and os.path.getmtime(full) >= after_ts - 5):
            cands.append(full)
    return max(cands, default=None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run-dir", required=True,
                   help="run dir of the live trainer to supervise")
    p.add_argument("--pid-file", default="/tmp/run.pid")
    p.add_argument("--result-root", default="/root/repo/results")
    p.add_argument("--target", type=int, default=997)
    p.add_argument("--drop-threshold", type=int, default=100)
    p.add_argument("--min-peak", type=int, default=600)
    p.add_argument("--min-kimg", type=int, default=100,
                   help="never judge collapse before this snapshot kimg: "
                        "fresh runs oscillate hard early (measured 663 @20 "
                        "-> 290 @40 -> 659 @80 on run 00015) and an abort "
                        "there throws away a healthy draw")
    p.add_argument("--poll-sec", type=float, default=90.0)
    p.add_argument("--max-relaunches", type=int, default=6)
    p.add_argument("--d-lrate", type=float, default=0.001,
                   help="D lrate of the CURRENT supervised run (level 0)")
    p.add_argument("--rec-weight", type=float, default=2.5,
                   help="rec weight of the CURRENT supervised run")
    p.add_argument("--fallback-checkpoint", default=None,
                   help="resume point if the supervised run has no better "
                        "checkpoint of its own")
    p.add_argument("--fallback-count", type=int, default=0,
                   help="mode count of --fallback-checkpoint")
    p.add_argument("--fallback-pkl", default=None,
                   help="weights-only snapshot (e.g. the git-mirrored fp16 "
                        "best from scripts/restore_best_weights.py) used "
                        "when no orbax checkpoint beats it; relaunches with "
                        "--resume-pkl + --resume-rampup-kimg so the fresh "
                        "Adam moments warm up instead of knocking modes off")
    p.add_argument("--fallback-pkl-count", type=int, default=0,
                   help="mode count of --fallback-pkl")
    p.add_argument("--resume-rampup-kimg", type=float, default=40.0,
                   help="lr warmup span for --fallback-pkl relaunches")
    p.add_argument("--relaunch-fresh", action="store_true",
                   help="lottery mode: on collapse, relaunch FROM SCRATCH "
                        "with a new --seed instead of resuming a checkpoint. "
                        "Motivated by the 2026-08-19 history: every resume "
                        "family decays below its source's peak, while fresh "
                        "runs hold the peak record (994 @622)")
    p.add_argument("--base-seed", type=int, default=1000,
                   help="seed of the CURRENT supervised run; fresh "
                        "relaunches use base_seed + 1000*relaunch_index")
    p.add_argument("--exp-script",
                   default="scripts/exp_stacked_mode_coverage.py",
                   help="trainer entry point (stub-able for dry drives)")
    p.add_argument("--repo-root", default="/root/repo")
    p.add_argument("--launch-args", default=(
        "--data-dir /tmp/exp/datasets --dataset stacked_synth_240k "
        "--data-size 240000 --num-samples-factor 10 --init-proj-dim 128 "
        "--candidate-batch-size 2048 "
        "--classifier /tmp/exp/stacked_mnist_classifier.npz "
        "--result-root /root/repo/results --image-snapshot-ticks 5 "
        "--network-snapshot-ticks 2 "
        "--lpips-weights /tmp/exp/perceptual_vgg.npz"),
                   help="base args for exp_stacked_mode_coverage.py relaunch")
    args = p.parse_args()

    root = args.result_root
    run_dir = os.path.abspath(args.run_dir)
    d_lrate, rec_weight = args.d_lrate, args.rec_weight
    # global best across all supervised runs: (count, path, kind).
    # kind 'ckpt' = orbax full state (--resume-checkpoint); kind 'pkl' =
    # weights-only snapshot (--resume-pkl + lr rampup, fresh Adam moments)
    best = (args.fallback_count, args.fallback_checkpoint, "ckpt")
    if args.fallback_pkl and args.fallback_pkl_count >= best[0]:
        best = (args.fallback_pkl_count, args.fallback_pkl, "pkl")
    relaunches = 0
    seen = 0
    child = None  # Popen of a trainer WE launched (poll() reaps; os.kill(0)
    # on an unreaped child zombie would report it alive forever)
    we_aborted = False  # wrote abort.txt into the current run_dir ourselves
    # doom-loop breaker: resumes are deterministic (same checkpoint + same
    # knobs reproduce the SAME collapse — measured 3x identical 741->41
    # trajectories from 00007/step_00662728 on 2026-08-19), so a source that
    # collapsed ONCE is burned: step back one snapshot per failure instead
    # of relaunching it verbatim even once.
    fail_counts = {}
    cur_src = args.fallback_checkpoint  # what the supervised run resumed from
    log(root, f"watchdog start: run_dir={run_dir} d_lrate={d_lrate} "
              f"rec_weight={rec_weight} target>={args.target}")

    def relaunch(src, reason):
        nonlocal run_dir, relaunches, seen, child, we_aborted, cur_src
        from_ckpt, kind = src
        if args.relaunch_fresh:
            from_ckpt, kind = None, "ckpt"
        if from_ckpt and kind == "ckpt":
            while from_ckpt and fail_counts.get(from_ckpt, 0) >= 1:
                prev = earlier_checkpoint(from_ckpt)
                log(root, f"source {from_ckpt} collapsed "
                          f"{fail_counts[from_ckpt]}x; stepping back to "
                          f"{prev}")
                from_ckpt = prev
            if from_ckpt is None:
                log(root, "no un-burned checkpoint left to resume from; "
                          "watchdog exiting")
                sys.exit(1)
        cur_src = from_ckpt
        we_aborted = False  # the new run dir starts clean
        relaunches += 1
        if relaunches > args.max_relaunches:
            log(root, f"max relaunches ({args.max_relaunches}) reached; "
                      "watchdog exiting")
            sys.exit(0)
        if from_ckpt and kind == "pkl":
            # NO --resume-g-from-gs: starting G from the EMA weights scores
            # higher on the first eval (942 vs 919 @321) but breaks the G/D
            # adversarial equilibrium once the lr rampup ends — measured
            # collapse 942->726 by 361 kimg (run 00011) where the plain
            # resume recovered (919->878->909, run 00003). Escalated knobs
            # do not rescue a bad resume either (00001: 508 @341).
            resume = (f"--resume-pkl {from_ckpt} --resume-staleness 1 "
                      f"--resume-rampup-kimg {args.resume_rampup_kimg:g} ")
        elif from_ckpt:
            resume = f"--resume-checkpoint {from_ckpt} --resume-staleness 1 "
        else:
            resume = ""
        seed_arg = (f"--seed {args.base_seed + 1000 * relaunches} "
                    if args.relaunch_fresh else "")
        cmd = (f"{sys.executable} {args.exp_script} "
               f"{args.launch_args} {resume}{seed_arg}"
               f"--d-lrate {d_lrate:g} --rec-weight {rec_weight:g}")
        log(root, f"relaunch #{relaunches} ({reason}): {cmd}")
        t0 = time.time()
        proc = subprocess.Popen(
            cmd.split(), cwd=args.repo_root,
            stdout=open(f"/tmp/exp_relaunch_{relaunches}.out", "w"),
            stderr=subprocess.STDOUT, start_new_session=True)
        child = proc
        with open(args.pid_file, "w") as f:
            f.write(str(proc.pid))
        # wait for the new numbered run dir to appear
        nd = None
        while nd is None and proc.poll() is None:
            time.sleep(10)
            nd = newest_run_dir(root, "mode-coverage", t0)
        if nd is None:
            log(root, f"relaunch #{relaunches} died before creating a run "
                      f"dir (see /tmp/exp_relaunch_{relaunches}.out)")
            return
        run_dir = nd
        seen = 0
        log(root, f"supervising new run dir {run_dir} (pid {proc.pid})")

    while True:
        time.sleep(args.poll_sec)
        entries = read_metrics(run_dir)
        for kimg, count, kl in entries[seen:]:
            log(root, f"eval @ {kimg} kimg: {count} modes"
                      + (f" KL {kl}" if kl is not None else ""))
            if count >= args.target:
                log(root, f"*** NORTH STAR: {count} >= {args.target} "
                          f"(snapshot {kimg} in {run_dir}) ***")
            if count > best[0]:
                ck = checkpoint_for_kimg(run_dir, kimg)
                if ck:
                    best = (count, ck, "ckpt")
        seen = len(entries)

        try:
            pid = int(open(args.pid_file).read().strip())
        except (OSError, ValueError):
            pid = None
        if child is not None and pid == child.pid:
            alive = child.poll() is None
        else:
            alive = pid_alive(pid)

        latest = entries[-1] if entries else None
        # collapse is relative to the run's OWN peak (see module docstring)
        own_peak = max([c for _, c, _ in entries], default=0)
        collapsed = (latest is not None and latest[0] >= args.min_kimg
                     and own_peak >= args.min_peak
                     and own_peak - latest[1] > args.drop_threshold)

        # an abort.txt WE did not write is an external stop (bench.py
        # yields the chip this way at round end; or the operator) — never
        # fight it with a relaunch
        external_abort = (os.path.exists(os.path.join(run_dir, "abort.txt"))
                          and not we_aborted)
        if external_abort:
            if not alive:
                log(root, "external abort honored; watchdog exiting")
                sys.exit(0)
        elif collapsed and alive:
            log(root, f"collapse: latest {latest[1]} vs peak {own_peak}; "
                      f"aborting {run_dir}")
            we_aborted = True
            open(os.path.join(run_dir, "abort.txt"), "w").close()
            deadline = time.time() + 3600
            while (not os.path.exists(os.path.join(run_dir, "_finished.txt"))
                   and time.time() < deadline):
                time.sleep(15)
            def _alive():
                if child is not None and pid == child.pid:
                    return child.poll() is None
                return pid_alive(pid)
            while _alive() and time.time() < deadline:
                time.sleep(5)
            if cur_src:
                fail_counts[cur_src] = fail_counts.get(cur_src, 0) + 1
            # base knobs, no escalation: measured twice (BENCH_NOTES
            # resume-recipe A/B + the 2026-08-19 ladder) that escalated
            # d-lr/rec-weight does not rescue a collapse and the plain
            # resume recipe does
            relaunch(best[1:], f"collapse to {latest[1]}")
        elif not alive:
            if os.path.exists(os.path.join(run_dir, "_finished.txt")) \
                    and not collapsed:
                err = [n for n in os.listdir(run_dir)
                       if n.endswith("-error.txt")]
                if err:
                    ck = latest_checkpoint(run_dir)
                    relaunch((ck, "ckpt") if ck else best[1:],
                             f"crash ({err[0]})")
                else:
                    log(root, "run finished cleanly (total_kimg or abort); "
                              "watchdog exiting")
                    sys.exit(0)
            elif collapsed:
                if cur_src:
                    fail_counts[cur_src] = fail_counts.get(cur_src, 0) + 1
                relaunch(best[1:], f"exited collapsed ({latest[1]})")
            else:
                ck = latest_checkpoint(run_dir)
                relaunch((ck, "ckpt") if ck else best[1:],
                         "process vanished without sentinel")


if __name__ == "__main__":
    main()
