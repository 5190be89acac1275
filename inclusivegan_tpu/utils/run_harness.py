"""Run-dir harness — capability parity with ``dnnlib.submission``.

Reference behavior being reproduced (file:line in /root/reference/):
  * numbered run dirs ``results/NNNNN-<desc>`` (submit.py:173-224)
  * ``submit_config.pkl`` + pretty ``submit_config.txt`` (submit.py:229-231)
  * stdout tee to ``log.txt`` (submit.py:262)
  * run function resolved from a dotted name and invoked with kwargs
    (submit.py:274-280)
  * crash log ``<run>-error.txt`` and ``_finished.txt`` sentinel
    (submit.py:283-296)
  * cooperative stop via an ``abort.txt`` file polled by RunContext
    (run_context.py:63-97), plus ``run.txt`` start/stop metadata.

Design difference: no multi-target plumbing — TPU runs are local processes
(multi-host scale-out is jax.distributed inside the run function, not a
submission backend), so "local" is the only target and is inlined.
"""

import datetime
import os
import pickle
import pprint
import re
import time
import traceback
from typing import Any, Optional

from .easydict import EasyDict, pretty
from .logger import Logger
from .registry import get_obj_by_name


class SubmitConfig(EasyDict):
    """Config describing one run. Attribute names follow the reference
    (submit.py:64-101) so downstream code / run-dir artifacts line up."""

    def __init__(self, **kwargs):
        super().__init__()
        self.run_dir_root = "results"
        self.run_desc = ""
        self.run_dir_ignore = ["__pycache__", ".git", "results", "datasets", ".cache"]
        self.run_func_name = None
        self.run_func_kwargs = {}
        self.num_devices = 1          # reference: num_gpus
        self.print_info = False
        # copy the framework source into run_dir/src for reproducibility
        # (reference submit.py:227-252; its CLIs default this off too)
        self.copy_source_files = False
        # populated by submit_run:
        self.run_id = None
        self.run_name = None
        self.run_dir = None
        self.submit_time = 0.0
        self.task_name = None
        self.host_name = "localhost"
        self.update(kwargs)


def _get_next_run_id(run_dir_root: str) -> int:
    ids = [0]
    if os.path.isdir(run_dir_root):
        for name in os.listdir(run_dir_root):
            m = re.match(r"^(\d+)-", name)
            if m:
                ids.append(int(m.group(1)) + 1)
    return max(ids)


def make_run_dir_path(*paths) -> str:
    """Path inside the currently active run dir (reference: submit.py:173)."""
    assert _current_submit_config is not None, "no active run"
    return os.path.join(_current_submit_config.run_dir, *paths)


_current_submit_config: Optional[SubmitConfig] = None


def get_current_submit_config() -> Optional[SubmitConfig]:
    return _current_submit_config


def submit_run(submit_config: SubmitConfig, run_func_name: str, **run_func_kwargs) -> Any:
    """Create a run dir, install logging, resolve & call the run function."""
    global _current_submit_config
    submit_config = SubmitConfig(**submit_config)
    submit_config.run_func_name = run_func_name
    submit_config.run_func_kwargs = run_func_kwargs

    # --- run dir -----------------------------------------------------------
    os.makedirs(submit_config.run_dir_root, exist_ok=True)
    submit_config.run_id = _get_next_run_id(submit_config.run_dir_root)
    submit_config.run_name = f"{submit_config.run_id:05d}-{submit_config.run_desc}"
    run_dir = os.path.join(submit_config.run_dir_root, submit_config.run_name)
    assert not os.path.exists(run_dir), run_dir
    os.makedirs(run_dir)
    submit_config.run_dir = run_dir
    submit_config.submit_time = time.time()
    submit_config.task_name = f"{os.environ.get('USER', 'user')}-{submit_config.run_name}"

    with open(os.path.join(run_dir, "submit_config.pkl"), "wb") as f:
        pickle.dump(submit_config, f)
    with open(os.path.join(run_dir, "submit_config.txt"), "w") as f:
        f.write(pretty(submit_config) + "\n")

    if submit_config.get("copy_source_files"):
        import shutil
        pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = os.path.join(run_dir, "src", os.path.basename(pkg_dir))
        shutil.copytree(
            pkg_dir, dst,
            ignore=shutil.ignore_patterns(*submit_config.run_dir_ignore,
                                          "*.so", "*.pyc"))

    # --- run wrapper --------------------------------------------------------
    logger = Logger(os.path.join(run_dir, "log.txt"), mode="w")
    _current_submit_config = submit_config
    start = time.time()
    exit_with_error = False
    try:
        print(f"dnnlib: Running {run_func_name}() on localhost...")
        run_func = get_obj_by_name(run_func_name)
        result = run_func(submit_config=submit_config, **run_func_kwargs)
        print(f"dnnlib: Finished {run_func_name}() in "
              f"{datetime.timedelta(seconds=round(time.time() - start))}.")
        return result
    except Exception:
        exit_with_error = True
        traceback.print_exc()
        with open(os.path.join(run_dir, f"{submit_config.task_name}-error.txt"), "w") as f:
            f.write(traceback.format_exc())
        raise
    finally:
        open(os.path.join(run_dir, "_finished.txt"), "w").close()
        _current_submit_config = None
        logger.close()
        if exit_with_error:
            pass


class RunContext:
    """Loop helper: tick timing, cooperative abort, run.txt metadata
    (reference: dnnlib/submission/run_context.py)."""

    def __init__(self, submit_config: SubmitConfig, config_module=None):
        self.submit_config = submit_config
        self.should_stop_flag = False
        self.has_closed = False
        self.start_time = time.time()
        self.last_update_time = self.start_time
        self.last_update_interval = 0.0
        self._write_run_txt("start")

    def __enter__(self) -> "RunContext":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def update(self, loss: Any = 0, cur_epoch: Any = 0, max_epoch: Any = None) -> None:
        assert not self.has_closed
        now = time.time()
        self.last_update_interval = now - self.last_update_time
        self.last_update_time = now

    def should_stop(self) -> bool:
        if not self.should_stop_flag:
            if os.path.exists(os.path.join(self.submit_config.run_dir, "abort.txt")):
                self.should_stop_flag = True
        return self.should_stop_flag

    def get_time_since_start(self) -> float:
        return time.time() - self.start_time

    def get_time_since_last_update(self) -> float:
        return time.time() - self.last_update_time

    def get_last_update_interval(self) -> float:
        return self.last_update_interval

    def close(self) -> None:
        if not self.has_closed:
            self._write_run_txt("stop")
            self.has_closed = True

    def _write_run_txt(self, state: str) -> None:
        path = os.path.join(self.submit_config.run_dir, "run.txt")
        with open(path, "a") as f:
            f.write(f"{state}: {datetime.datetime.now().isoformat()} "
                    f"task {self.submit_config.task_name}\n")
