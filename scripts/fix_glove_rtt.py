"""Measure the dispatch RTT with the FIXED probe (device->host scalar
fetch) and patch the glove latency artifact's rtt_ms +
blocked_ms_p50_minus_rtt fields (its leg ran with the broken
block_until_ready probe that read 0.0 ms)."""

import json
import sys

sys.path.insert(0, ".")
from bench import wait_for_backend  # noqa: E402


def main():
    wait_for_backend()
    from scripts.bench_latency import measure_rtt

    rtt = measure_rtt()
    print(f"rtt_ms: {rtt:.2f}", flush=True)
    path = "results/latency_curve.json"
    with open(path) as f:
        d = json.load(f)
    g = d.get("glove")
    if g is not None:
        g["rtt_ms"] = round(rtt, 3)
        for eng in g.get("engines", {}).values():
            for pt in eng.values():
                if "blocked_ms_p50" in pt:
                    pt["blocked_ms_p50_minus_rtt"] = round(
                        max(pt["blocked_ms_p50"] - rtt,
                            pt.get("pipelined_ms", 0.0)), 3)
        with open(path, "w") as f:
            json.dump(d, f, indent=1)
        print("patched glove curve", flush=True)


if __name__ == "__main__":
    main()
