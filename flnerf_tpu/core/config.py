"""configargparse-compatible CLI layer (self-contained, no external dep).

The reference preserves a configargparse CLI (nerf-ours/argument_parser.py:4-123,
nerf++-ours/ddp_train_nerf.py:428-498); BASELINE requires keeping that flag
surface.  configargparse is not available in this environment, so this module
implements the subset the reference uses:

  * ``parser.add_argument('--config', is_config_file=True)``
  * config files with ``key = value`` lines, ``#`` comments, booleans written
    as ``True``/``False``, repeated keys override earlier ones
  * CLI flags override config-file values
  * ``store_true`` flags can be set from the config file with ``flag = True``
"""

from __future__ import annotations

import argparse
import shlex
import sys
from typing import List, Optional


def _parse_config_file(path: str) -> dict:
    """Parse a ``key = value`` config file into {dest: raw-string}."""
    out = {}
    with open(path, "r") as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if "=" in line:
                key, val = line.split("=", 1)
            elif " " in line:
                key, val = line.split(None, 1)
            else:
                key, val = line, "True"
            out[key.strip()] = val.strip()
    return out


class ConfigArgumentParser(argparse.ArgumentParser):
    """argparse.ArgumentParser + configargparse's config-file support."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._config_file_dests: List[str] = []

    def add_argument(self, *args, **kwargs):  # type: ignore[override]
        is_config_file = kwargs.pop("is_config_file", False)
        action = super().add_argument(*args, **kwargs)
        if is_config_file:
            self._config_file_dests.append(action.dest)
        return action

    def parse_args(self, args: Optional[List[str]] = None, namespace=None):  # type: ignore[override]
        if args is None:
            args = sys.argv[1:]
        args = list(args)

        # First pass: only find the config-file path.
        pre = argparse.ArgumentParser(add_help=False)
        for dest in self._config_file_dests:
            pre.add_argument("--" + dest, type=str, default=None)
        pre_ns, _ = pre.parse_known_args(args)

        config_values = {}
        for dest in self._config_file_dests:
            path = getattr(pre_ns, dest, None)
            if path:
                config_values.update(_parse_config_file(path))

        # Build synthetic argv: config-file values first (so real CLI wins).
        synthetic: List[str] = []
        actions_by_dest = {a.dest: a for a in self._actions}
        for key, raw in config_values.items():
            act = actions_by_dest.get(key)
            if act is None:
                # Unknown keys are ignored, matching configargparse's
                # behaviour with ignore_unknown_config_file_keys-ish usage.
                continue
            if isinstance(act, (argparse._StoreTrueAction, argparse._StoreFalseAction)):
                if raw.lower() in ("true", "1", "yes"):
                    synthetic.append("--" + key)
            elif isinstance(act, argparse._AppendAction) or act.nargs in ("+", "*"):
                for tok in shlex.split(raw):
                    synthetic.extend(["--" + key, tok])
            else:
                synthetic.extend(["--" + key, raw])

        return super().parse_args(synthetic + args, namespace=namespace)


def save_args(args, path: str) -> None:
    """Write an args snapshot, mirroring run_nerf.py:251-255 (args.txt)."""
    with open(path, "w") as f:
        for k in sorted(vars(args)):
            f.write("{} = {}\n".format(k, getattr(args, k)))
