"""Device-profile the full training step at the re10k small config and print
the top ops with source attribution (development tool)."""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

import __graft_entry__ as ge
from my_depthsplat_tpu.train import LossCfg, OptimizerCfg, TrainCfg, make_train_step


def main() -> None:
    cfg = TrainCfg(
        encoder=ge._encoder_cfg(tiny=False),
        loss=LossCfg(lpips_weight=0.0),
        optimizer=OptimizerCfg(total_steps=1000),
    )
    init_fn, train_step = make_train_step(cfg)
    batch = ge._make_batch(b=1, v_ctx=2, v_tgt=4, h=256, w=256)
    state = init_fn(jax.random.key(0), batch)
    jax.block_until_ready(state.params)
    step = jax.jit(train_step)
    state, logs = step(state, batch)
    jax.block_until_ready(logs["loss/total"])
    print("compiled", flush=True)

    jax.profiler.start_trace("/tmp/traintrace")
    state, logs = step(state, batch)
    jax.block_until_ready(logs["loss/total"])
    jax.profiler.stop_trace()

    import re

    hlo = jax.jit(train_step).lower(state, batch).compile().as_text()
    src = {}
    pat = re.compile(
        r'%(\S+?) = .*?metadata=\{[^}]*?op_name="([^"]*)"'
        r'(?:[^}]*?source_file="([^"]*)")?(?:[^}]*?source_line=(\d+))?'
    )
    for line in hlo.splitlines():
        m = pat.search(line)
        if m:
            name, opn, fl, ln = m.groups()
            src[name] = (fl or "?", ln or "?", opn.split("/")[-1])

    fn = sorted(glob.glob("/tmp/traintrace/plugins/profile/*/vm.trace.json.gz"))[-1]
    with gzip.open(fn) as f:
        tr = json.load(f)
    evs = [e for e in tr["traceEvents"] if e.get("ph") == "X"]
    tot = [e for e in evs if str(e.get("name", "")).startswith("jit_train_step")]
    if tot:
        print(f"step device time: {max(e['dur'] for e in tot)/1e3:.1f} ms")
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in evs:
        if e.get("pid") == 3 and e.get("tid") == 3:
            fl, ln, opn = src.get(
                e["name"], ("<unattr:%s>" % e["name"].split(".")[0], "", "")
            )
            key = f"{fl.split('/')[-1]}:{ln} {opn}"
            agg[key] += e.get("dur", 0) / 1e3
            cnt[key] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    for n, t in rows[:45]:
        print(f"{t:9.3f} ms x{cnt[n]:<5d} {n[:85]}")
    print(f"rest: {sum(t for _, t in rows[45:]):.1f} ms in {len(rows)-45} keys")


if __name__ == "__main__":
    main()
