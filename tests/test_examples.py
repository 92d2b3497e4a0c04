"""The examples/ scripts are executable documentation — every
`python main.py …` command in them must stay parseable by the real CLI
parser, name a registered model, and carry a literal-evaluable
--model-config. Guards against flag drift (reference analog: its
README commands going stale against main.py's argparse surface).
"""

import ast
import glob
import os
import re
import shlex

import pytest

from convnet_tpu.cli.main import build_parser
from convnet_tpu.models import REGISTRY

EXAMPLES = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "..", "examples", "*.sh")))


def _main_commands(path):
    """Extract argv lists for each `python main.py …` in a script,
    joining backslash-continued lines and stripping shell-only tokens."""
    with open(path) as f:
        text = f.read()
    text = text.replace("\\\n", " ")
    cmds = []
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("python main.py"):
            continue
        # neutralize shell parameter expansions for shlex/argparse —
        # "0" parses as int AND as a path/string, covering both arg types
        line = line.replace('"$@"', "")
        line = re.sub(r"\$\{[A-Za-z_]+:\?\}", "0", line)
        line = re.sub(r"\$\{?[A-Za-z_@]+\}?", "0", line)
        cmds.append(shlex.split(line)[2:])  # drop: python main.py
    return cmds


def test_examples_exist():
    assert len(EXAMPLES) >= 8


@pytest.mark.parametrize("path", EXAMPLES,
                         ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_commands_parse(path):
    parser = build_parser()
    cmds = _main_commands(path)
    for argv in cmds:
        args = parser.parse_args(argv)  # SystemExit on unknown flags
        if args.model is not None:
            assert args.model in REGISTRY, (
                f"{os.path.basename(path)}: unknown model {args.model!r}")
        if args.model_config:
            cfg = ast.literal_eval(args.model_config)
            assert isinstance(cfg, dict)
