"""The scaling model's comm terms vs the program that actually runs.

VERDICT r3 weak #7: ``parallel.scaling.analyze``'s pipeline-bubble and
gather-bytes terms had never been validated against a trace.  Here the
jaxpr-level tracer (``parallel.commtrace``) counts every collective the
pipelined sharded decode issues on a virtual mesh (scan trip counts
multiplied through) and pins:

* ppermute bytes EXACTLY equal the model's delta-hop term — the tick
  count inside is the pipeline bubble, so this pins the bubble formula;
* psum bytes EXACTLY equal the model's path-psum term;
* total per-device received bytes within 15% of the model (the state
  gathers moved from 2-per-step (delta+ptr) to the recompute pipeline's
  delta-gather + walk-column fetches; volumes stay equivalent).
"""

import math

import pytest

from flash_viterbi_tpu.parallel.commtrace import trace_sharded_decode
from flash_viterbi_tpu.parallel.scaling import analyze
from flash_viterbi_tpu.parallel.sharded import make_mesh


@pytest.mark.parametrize("shape,batch,segs,mb", [
    ((2, 2, 2), 8, 8, 1),
    ((1, 4, 2), 8, 8, 2),
    ((2, 1, 4), 8, 4, 1),
])
def test_model_matches_traced_collectives(shape, batch, segs, mb):
    d, s, t = shape
    mesh = make_mesh(d, s, t)
    K, T = 64, 64
    got = trace_sharded_decode(mesh, K=K, T=T, batch=batch,
                               num_segments=segs, microbatch=mb)
    rep = analyze(shape, K=K, T=T, batch=batch, num_segments=segs,
                  microbatch=mb)

    # model's individual seq-axis terms (mirror analyze()'s formulas)
    Bd = batch // d
    n_mb = Bd // min(mb, Bd)
    ticks = n_mb + s - 1
    hop_bytes = ticks * min(mb, Bd) * K * 4 if s > 1 else 0
    psum_bytes = (math.ceil(math.log2(s)) * Bd * T * 4) if s > 1 else 0

    traced_hop = got.get("ppermute", {}).get("bytes", 0)
    traced_psum = got.get("psum", {}).get("bytes", 0)
    assert traced_hop == hop_bytes, (traced_hop, hop_bytes)
    assert traced_psum == psum_bytes, (traced_psum, psum_bytes)

    total = sum(v["bytes"] for v in got.values())
    assert total == pytest.approx(rep.ici_bytes_per_device, rel=0.15), (
        total, rep.ici_bytes_per_device)
