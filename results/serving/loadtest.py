"""Serving load test on the real chip (round-4 verdict missing #3).

Everything about serve.py was CPU-functional-tested through round 4;
this measures what the deployed stack actually sustains on the TPU:

  - warm-start time (checkpoint restore + bucket compiles, with the
    persistent XLA compile cache),
  - closed-loop sustained throughput at several client concurrencies
    (each client posts npy uint8 batches back-to-back and waits for its
    response — images/sec counted over completed responses only),
  - request latency p50/p95/max per load level (host-observed, includes
    HTTP + queueing + device + relay),
  - overload behavior past the admission cap: shed (503) rate while
    saturated, and that goodput does not collapse,
  - batcher internals from /healthz (batch fill, queue depth).

The relay caveat (BASELINE.md, devtime.py): host-observed LATENCY here
rides the axon relay tunnel, which adds an RTT floor a colocated
deployment would not pay.  THROUGHPUT is honest — every response
materializes real device results (serve.py's completion thread blocks
on np.asarray) — but per-request latency should be read as
relay-inflated; the JSON records a measured relay RTT floor next to it.

Usage: python results/serving/loadtest.py <checkpoint_dir> [--config flagship]
Writes results/serving/loadtest.json.
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def post_npy(url: str, arr: np.ndarray, timeout: float = 120.0):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(
        url + "/predict", data=buf.getvalue(),
        headers={"Content-Type": "application/x-npy"}, method="POST",
    )
    t0 = time.monotonic()
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            n = len(json.loads(r.read())["predictions"])
            return time.monotonic() - t0, n, 200
    except urllib.error.HTTPError as e:
        e.read()
        return time.monotonic() - t0, 0, e.code


def healthz(url: str) -> dict:
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        return json.loads(r.read())


def run_level(url: str, n_clients: int, req_images: int, duration_s: float,
              hw: tuple) -> dict:
    """Closed loop: n_clients each posting req_images uint8 frames
    back-to-back for duration_s; returns goodput + latency stats."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (req_images, *hw, 3), dtype=np.uint8)
    stop = time.monotonic() + duration_s
    lat, codes = [], []
    ok_images = [0]
    lock = threading.Lock()

    def client():
        while time.monotonic() < stop:
            dt, n, code = post_npy(url, img)
            with lock:
                lat.append(dt)
                codes.append(code)
                ok_images[0] += n

    t0 = time.monotonic()
    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    lat_ok = [l for l, c in zip(lat, codes) if c == 200] or [float("nan")]
    q = np.percentile(lat_ok, [50, 95]) if lat_ok else [float("nan")] * 2
    h = healthz(url)["batcher"]
    return {
        "clients": n_clients,
        "images_per_request": req_images,
        "duration_s": round(wall, 1),
        "requests_ok": sum(1 for c in codes if c == 200),
        "requests_shed_503": sum(1 for c in codes if c == 503),
        "sustained_images_per_sec": round(ok_images[0] / wall, 1),
        "latency_ms": {
            "p50": round(float(q[0]) * 1e3, 1),
            "p95": round(float(q[1]) * 1e3, 1),
            "max": round(float(max(lat_ok)) * 1e3, 1),
        },
        "server_mean_batch_fill": h.get("mean_batch_fill"),
        "server_queue_depth_images": h.get("queue_depth_images"),
        "server_shed_requests_total": h.get("shed_requests"),
    }


def measure_ingress_bw() -> dict:
    """Host->device transfer rate through the relay for a flagship
    uint8 batch (the term that bounds this rig's serving throughput: a
    230 KB image at the measured ~24 MB/s caps ANY server at ~100
    img/s; a colocated deployment's PCIe moves the same batch in
    <1 ms)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x[0, 0, 0, 0].astype(jnp.float32) + 1)
    x = np.random.RandomState(0).randint(
        0, 256, (128, 240, 320, 3), dtype=np.uint8)
    np.asarray(f(jax.device_put(x)))  # compile
    ts = []
    for _ in range(5):
        t0 = time.monotonic()
        np.asarray(f(jax.device_put(x)))  # forces the transfer to land
        ts.append(time.monotonic() - t0)
    sec = float(np.median(ts))
    mb = x.nbytes / 1e6
    return {
        "batch_mb": round(mb, 1),
        "median_s_per_batch128": round(sec, 3),
        "mb_per_sec": round(mb / sec, 1),
        "images_per_sec_ingress_cap": round(128 / sec, 1),
    }


def measure_relay_rtt() -> float:
    """Median round trip of a trivial 1-element device program (the
    floor the tunnel puts under every request's device leg)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((1,), jnp.float32)
    np.asarray(f(x))  # compile
    ts = []
    for _ in range(9):
        t0 = time.monotonic()
        np.asarray(f(x))
        ts.append(time.monotonic() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--config", default="flagship")
    ap.add_argument("--port", type=int, default=8491)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--buckets", default="8,32")
    ap.add_argument("--max-inflight", type=int, default=4)
    ap.add_argument("--duration", type=float, default=20.0)
    args = ap.parse_args()

    from jointpose.configs import get_config
    from jointpose.serve import PoseService, ThreadingHTTPServer, make_handler
    from jointpose.checkpoint import reconcile_config
    from jointpose.configs import with_mrf_precision

    config = reconcile_config(get_config(args.config), args.checkpoint, None)
    config = with_mrf_precision(config, "default")
    hw = config.data.image_hw

    t0 = time.monotonic()
    service = PoseService(
        config, args.checkpoint, args.batch_size, best=True,
        batch_wait_ms=2.0,
        batch_buckets=[int(b) for b in args.buckets.split(",")],
        max_inflight=args.max_inflight,
    )
    warm_start_s = time.monotonic() - t0
    server = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(service))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{args.port}"
    print(f"warm start {warm_start_s:.1f}s (restore + bucket compiles)", flush=True)

    levels = []
    # (clients, imgs/request): single small request -> latency floor;
    # few big batches -> offline-shaped; many concurrent -> saturation.
    for nc, ni in [(1, 1), (1, args.batch_size), (4, 32), (8, 64),
                   (16, args.batch_size), (32, args.batch_size)]:
        lv = run_level(url, nc, ni, args.duration, hw)
        print(json.dumps(lv), flush=True)
        levels.append(lv)

    rtt = measure_relay_rtt()
    ingress = measure_ingress_bw()
    out = {
        "config": args.config,
        "batch_size": args.batch_size,
        "buckets": args.buckets,
        "max_inflight": args.max_inflight,
        "warm_start_s": round(warm_start_s, 1),
        "relay_rtt_floor_ms": round(rtt * 1e3, 1),
        "relay_ingress": ingress,
        "note": (
            "closed-loop HTTP clients against serve.py on the real chip; "
            "throughput counts only completed responses (device results "
            "materialized).  On THIS rig the binding resource is the axon "
            "relay tunnel's host->device ingress (relay_ingress: ~24 MB/s "
            "measured = ~104 uint8 flagship img/s physical cap); the best "
            "sustained level below should be read against that cap, not "
            "against the 18.1k img/s on-chip number (which a colocated "
            "PCIe deployment's ~10+ GB/s ingress would feed).  Latency "
            "includes the tunnel RTT recorded in relay_rtt_floor_ms."
        ),
        "levels": levels,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "loadtest.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote loadtest.json", flush=True)
    server.shutdown()
    service.close()


if __name__ == "__main__":
    main()
