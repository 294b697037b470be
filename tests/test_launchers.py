"""Flag-parity guard for the shell launchers (scripts/run_*.sh): every
``--flag`` a launcher passes must be accepted by its CLI's argparse
surface, so launcher/CLI drift fails CI instead of a user's run.
Reference equivalents: /root/reference/run_stage{1,2,3}.sh and
run_test_stage{1,2,3}.sh."""

import os
import re

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")

LAUNCHER_CLIS = {
    "run_stage1.sh": ["pcdms_tpu.cli.stage1_train"],
    "run_stage2.sh": ["pcdms_tpu.cli.stage2_train"],
    "run_stage3.sh": ["pcdms_tpu.cli.stage3_train"],
    "run_test_stages.sh": ["pcdms_tpu.cli.stage1_batchtest",
                           "pcdms_tpu.cli.stage2_batchtest",
                           "pcdms_tpu.cli.stage3_batchtest",
                           "pcdms_tpu.cli.calculate_metrics"],
}


def _flags_per_module(text):
    """Map each ``python -m <module>`` invocation to the --flags that
    follow it (until the next invocation)."""
    out = {}
    module = None
    for line in text.splitlines():
        m = re.search(r"python -m ([\w.]+)", line)
        if m:
            module = m.group(1)
            out.setdefault(module, set())
        if module:
            out[module].update(re.findall(r"--([\w-]+)", line))
    return out


def _known_flags(module):
    import importlib
    mod = importlib.import_module(module)
    parser_flags = set()
    # every CLI exposes parse_args; build the parser by introspection of
    # argparse's registry via a probe parse of --help-free empty argv
    import argparse
    orig = argparse.ArgumentParser.parse_args
    captured = {}

    def capture(self, args=None, namespace=None):
        captured["parser"] = self
        raise SystemExit(0)

    argparse.ArgumentParser.parse_args = capture
    try:
        with pytest.raises(SystemExit):
            mod.parse_args([])
    finally:
        argparse.ArgumentParser.parse_args = orig
    for action in captured["parser"]._actions:
        for opt in action.option_strings:
            if opt.startswith("--"):
                parser_flags.add(opt[2:])
    return parser_flags


@pytest.mark.parametrize("launcher", sorted(LAUNCHER_CLIS))
def test_launcher_flags_accepted(launcher):
    path = os.path.join(SCRIPTS, launcher)
    assert os.path.exists(path), launcher
    with open(path) as f:
        per_module = _flags_per_module(f.read())

    expected_modules = set(LAUNCHER_CLIS[launcher])
    assert expected_modules <= set(per_module), (
        launcher, sorted(per_module))

    for module in expected_modules:
        known = _known_flags(module)
        used = per_module[module]
        unknown = sorted(used - known)
        assert not unknown, (
            f"{launcher} passes flags {unknown} that "
            f"{module}.parse_args does not accept (knows {sorted(known)})")
