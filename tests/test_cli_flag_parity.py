"""CLI flag parity vs the reference's own argparse tree.

The reference builds its parser inside main() (deepsignal_plant.py:85);
we capture it by intercepting parse_args, then assert that EVERY
reference flag of every subcommand exists here with the same default.
This is the compatibility contract for users' existing command lines:
any reference invocation must be accepted unchanged.

Intentional deviations are listed explicitly in ALLOWED_DEFAULT_DIFFS
with the reason — anything else failing this test is a regression.
"""
import argparse
import sys

# (subcommand, flag) -> (reference default, ours, why)
ALLOWED_DEFAULT_DIFFS = {
    ("call_mods", "--nproc"): (
        10, 4,
        "the reference splits nproc between reader/model/writer PROCESSES "
        "(call_modifications.py:523-529); here nproc only sizes the "
        "host-side extraction pool (the TPU step is one process), so the "
        "default follows typical host cores rather than a GPU-server "
        "split"),
    ("extract", "--nproc"): (
        10, 4,
        "reference reserves one of nproc for its writer process "
        "(extract_features.py:560-575); our pooled workers write their "
        "own part files, every slot extracts — fewer default processes "
        "do the same work"),
}


class _Stop(Exception):
    pass


def _capture_reference_parser(reference_importable):
    cap = {}
    orig = argparse.ArgumentParser.parse_args

    def capture(self, *a, **k):
        cap["p"] = self
        raise _Stop

    argparse.ArgumentParser.parse_args = capture
    old_argv = sys.argv
    try:
        from deepsignal_plant.deepsignal_plant import main as ref_main
        sys.argv = ["deepsignal_plant"]
        try:
            ref_main()
        except _Stop:
            pass
    finally:
        argparse.ArgumentParser.parse_args = orig
        sys.argv = old_argv
    return cap["p"]


def _subparsers(parser):
    act = next(a for a in parser._actions
               if isinstance(a, argparse._SubParsersAction))
    return act.choices


def test_every_reference_flag_accepted_with_same_default(
        reference_importable):
    ref_subs = _subparsers(_capture_reference_parser(reference_importable))
    from deepsignal_plant_tpu.cli import build_parser
    our_subs = _subparsers(build_parser())

    assert set(ref_subs) <= set(our_subs), \
        f"missing subcommands: {set(ref_subs) - set(our_subs)}"

    problems = []
    for name, rp in ref_subs.items():
        ours_flags = {s: a for a in our_subs[name]._actions
                      for s in a.option_strings}
        for a in rp._actions:
            longs = [s for s in a.option_strings if s.startswith("--")]
            if not longs or longs[0] == "--help":
                continue
            key = longs[0]
            oa = ours_flags.get(key)
            if oa is None:
                problems.append(f"{name}: flag {key} missing")
                continue
            if oa.default != a.default:
                allowed = ALLOWED_DEFAULT_DIFFS.get((name, key))
                if allowed and allowed[0] == a.default \
                        and allowed[1] == oa.default:
                    continue
                problems.append(
                    f"{name}: {key} default ref={a.default!r} "
                    f"ours={oa.default!r} (not in allowlist)")
    assert not problems, "\n".join(problems)


def test_reference_short_flags_accepted(reference_importable):
    """Short options users type daily (-i/-o/-m/-b/-p ...) must map to
    the same destinations as the reference."""
    ref_subs = _subparsers(_capture_reference_parser(reference_importable))
    from deepsignal_plant_tpu.cli import build_parser
    our_subs = _subparsers(build_parser())

    problems = []
    for name, rp in ref_subs.items():
        ours = {s: a for a in our_subs[name]._actions
                for s in a.option_strings}
        for a in rp._actions:
            shorts = [s for s in a.option_strings
                      if s.startswith("-") and not s.startswith("--")]
            for s in shorts:
                if s in ("-h", "-v"):
                    continue
                oa = ours.get(s)
                if oa is None:
                    problems.append(f"{name}: short flag {s} missing")
                elif oa.dest != a.dest:
                    problems.append(f"{name}: {s} dest ref={a.dest} "
                                    f"ours={oa.dest}")
    assert not problems, "\n".join(problems)
