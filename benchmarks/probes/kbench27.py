"""Round-5 probe 3: engine-level online-training timing at 64k, proxy
route only (the north-star flagship row), after the round-5 train-step
fixes (single built-in evaluation for labels+drive, virial-slim train
loop, Pallas proxy backward).  Runs north_star.run_config directly so
the protocol is byte-identical to the committed artifact.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from north_star import run_config  # noqa: E402


def main():
    row = run_config(n=65536, steps=200, equil=400, rounds=4,
                     pair_decl=True, proxy=True)
    print(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
