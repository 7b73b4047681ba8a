"""A/B the Pallas fused HMC accept/select against the plain-XLA path
(VERDICT r3 item 4: the r2->r3 headline moved -9% across the round that
landed the fusion; establish whether the fusion is a pessimization at bench
shape or the move was dispatch noise).

Runs ONLY the funnel headline line of bench.py (same seeds, same protocol,
min-of-3 timing). The fused/unfused switch is read at module import
(ops/hmc_pallas.py FUSED_ACCEPT), so each arm runs in its own process:

  python tools/ab_fused_accept.py                       # plain XLA (default)
  NFTPU_FUSED_ACCEPT=1 python tools/ab_fused_accept.py  # Pallas fused

r4 verdict (recorded in PERF.md): plain XLA 0.834 s vs fused 0.942 s per
1024 draws at (8192, 64) -- the pallas_call fusion barrier costs more than
the selects it saves; the default is now the plain path.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

import bench
from normalizingflow_tpu.targets import NealsFunnel


def main():
    arm = ("fused"
           if os.environ.get("NFTPU_FUSED_ACCEPT") == "1" else "plain_xla")
    flow = bench.build_flow()
    funnel = bench.neutra_ess_run(
        flow, NealsFunnel(bench.DIM), jax.random.PRNGKey(0), arm
    )
    funnel.pop("samples")
    funnel.pop("params")
    print(json.dumps({"arm": arm, **funnel}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
