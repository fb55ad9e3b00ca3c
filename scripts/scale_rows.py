"""Round-2 SCALE.md measurement rows (headline-config, one chip).

Run: nohup python scripts/scale_rows.py > results/scale_rows.log 2>&1 &
(one TPU process at a time)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flash_viterbi_tpu.bench.harness import RunConfig, run_one


def main():
    cfgs = [
        # flash pointer (sanity vs round-1 18-22 ms)
        RunConfig(algorithm="flash", K=3965, M=50, T=256, prob=0.112, seed=1),
        # hybrid lean (VERDICT item 6: <= 40 ms bar)
        RunConfig(algorithm="flash", K=3965, M=50, T=256, prob=0.112, seed=1,
                  extra={"mode": "lean"}),
        # sieve_bs_mp at headline K (VERDICT item 5: beam-space step)
        RunConfig(algorithm="sieve_bs_mp", K=3965, M=50, T=256, prob=0.112,
                  seed=1, beam_width=64),
    ]
    for cfg in cfgs:
        row = run_one(cfg)
        print(json.dumps({k: row[k] for k in
                          ("algorithm", "K_STATE", "obserRouteLEN", "time",
                           "updates_per_s", "parity", "memory")}), flush=True)
    print("SCALE ROWS DONE", flush=True)


if __name__ == "__main__":
    main()
