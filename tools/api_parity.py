#!/usr/bin/env python3
"""AST-level API-parity report: flooder_tpu vs the reference flooder.

Parses both sources (no imports — the reference's torch/gudhi/fpsample
deps are absent here by design) and compares, for every public surface:

- the package ``__all__`` re-export list,
- core function signatures (name, parameter order, defaults) — the
  reference's parameters must be a PREFIX of ours in the same positions
  so positional call sites keep working; extras may only be appended,
- the four synthetic generator signatures,
- dataset class names,
- CLI long-option flags.

Usage: python tools/api_parity.py [--ref /root/reference] [--out FILE]
Exit code 1 if any reference surface is missing or misaligned.
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sigs(path: str, names=None) -> dict:
    tree = ast.parse(open(path).read())
    out = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef):
            if names and node.name not in names:
                continue
            a = node.args
            defaults = [None] * (len(a.args) - len(a.defaults)) + [
                ast.unparse(d) for d in a.defaults
            ]
            out[node.name] = [
                [arg.arg, d] for arg, d in zip(a.args, defaults)
            ]
    return out


def _classes(path: str) -> list:
    tree = ast.parse(open(path).read())
    return sorted(
        n.name for n in ast.walk(tree) if isinstance(n, ast.ClassDef)
    )


def _all_list(path: str) -> list:
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    return sorted(ast.literal_eval(node.value))
    return []


def _cli_flags(path: str) -> list:
    tree = ast.parse(open(path).read())
    flags = set()
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "add_argument"
        ):
            for a in node.args:
                if isinstance(a, ast.Constant) and str(a.value).startswith(
                    "--"
                ):
                    flags.add(a.value)
    return sorted(flags)


def _prefix_ok(ref_params, mine_params):
    """Reference params must appear as a prefix of ours, same order; our
    defaults may differ only by framework rename (documented)."""
    if mine_params is None:
        return False
    names_ref = [p[0] for p in ref_params]
    names_mine = [p[0] for p in mine_params]
    # the reference's use_triton slot is use_pallas here (alias kept as a
    # trailing kwarg) — treat the rename as positional parity
    names_mine = [
        "use_triton" if n == "use_pallas" else n for n in names_mine
    ]
    return names_mine[: len(names_ref)] == names_ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    ref = os.path.join(args.ref, "flooder")
    mine = os.path.join(REPO, "flooder_tpu")

    core_fns = {
        "flood_complex",
        "generate_landmarks",
        "generate_grid",
        "generate_uniform_weights",
    }
    gen_fns = {
        "generate_figure_eight_points_2d",
        "generate_swiss_cheese_points",
        "generate_annulus_points_2d",
        "generate_noisy_torus_points_3d",
    }

    ref_core = _sigs(os.path.join(ref, "core.py"), core_fns)
    my_core = _sigs(os.path.join(mine, "core.py"), core_fns)
    ref_gen = _sigs(os.path.join(ref, "synthetic_data_generators.py"), gen_fns)
    my_gen = _sigs(os.path.join(mine, "synthetic_data_generators.py"), gen_fns)
    ref_ds = _classes(os.path.join(ref, "datasets", "datasets.py"))
    my_ds = _classes(os.path.join(mine, "datasets", "datasets.py"))
    ref_all = _all_list(os.path.join(ref, "__init__.py"))
    my_all = _all_list(os.path.join(mine, "__init__.py"))
    ref_cli = _cli_flags(os.path.join(ref, "cli.py"))
    my_cli = _cli_flags(os.path.join(mine, "cli.py"))

    problems = []
    fn_report = {}
    for name in sorted(core_fns | gen_fns):
        r = (ref_core | ref_gen).get(name)
        m = (my_core | my_gen).get(name)
        ok = r is not None and _prefix_ok(r, m)
        fn_report[name] = {"ref": r, "mine": m, "positional_prefix_ok": ok}
        if not ok:
            problems.append(f"signature misalignment: {name}")

    missing_all = sorted(set(ref_all) - set(my_all))
    if missing_all:
        problems.append(f"__all__ missing: {missing_all}")
    missing_ds = sorted(set(ref_ds) - set(my_ds))
    if missing_ds:
        problems.append(f"dataset classes missing: {missing_ds}")
    # --cuda-events is CUDA-specific; replaced by --trace-dir (documented)
    missing_cli = sorted(set(ref_cli) - set(my_cli) - {"--cuda-events"})
    if missing_cli:
        problems.append(f"CLI flags missing: {missing_cli}")

    report = {
        "functions": fn_report,
        "__all__": {"ref": ref_all, "mine": my_all, "missing": missing_all},
        "dataset_classes": {
            "ref": ref_ds,
            "mine": my_ds,
            "missing": missing_ds,
        },
        "cli_flags": {
            "ref": ref_cli,
            "mine": my_cli,
            "missing_excl_cuda_events": missing_cli,
            "extra": sorted(set(my_cli) - set(ref_cli)),
        },
        "problems": problems,
    }
    text = json.dumps(report, indent=2)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(text + "\n")
    print(text)
    print(
        f"\n{'PARITY OK' if not problems else 'PROBLEMS: ' + '; '.join(problems)}",
        file=sys.stderr,
    )
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
