"""Run every BASELINE.json benchmark config and print one JSON object each.

Usage: python -m benchmarks.run_all [--cpu] [--only NAME]
"""

import argparse
import json
import sys
import traceback


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from benchmarks.configs import ALL

    for name, fn in ALL.items():
        if args.only and args.only != name:
            continue
        try:
            metrics = fn()
            print(json.dumps({"config": name, **{
                k: (round(v, 2) if isinstance(v, float) else v)
                for k, v in metrics.items()
            }}), flush=True)
        except Exception:
            print(json.dumps({"config": name, "error": "failed"}), flush=True)
            traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
