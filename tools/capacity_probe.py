"""Measure the largest (T=24, H, W) domain the monolithic on-device
inference engine can stitch on one chip, and time the streaming engine
past that ceiling (VERDICT r2 item 6 / BASELINE config 5 capacity story).

Binary-searches the spatial edge (square domains, flagship model, T=24)
between "fits" and "OOMs / fails to compile", then runs the streaming
engine on a domain past the ceiling to show the fallback works where the
monolithic engine cannot.  Writes docs/capacity_measured.json.

Run on the real chip (the bench harness environment):
    python tools/capacity_probe.py [--max-edge 4096] [--t 24]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _aspect_w(edge: int, aspect: float) -> int:
    """Lon edge for a given lat edge and aspect ratio, snapped to the
    96-px patch grid (>= one patch)."""
    return max(96, int(edge * aspect) // 96 * 96)


def _try_monolithic(edge: int, t: int, mcfg, icfg, g_vars,
                    aspect: float = 1.0):
    """(seconds, None) for one stitched domain, or (None, reason) if it
    does not fit."""
    import jax

    from windtpu.infer.engine import make_tiled_predictor
    from windtpu.infer.tiling import plan_tiling

    w_edge = _aspect_w(edge, aspect)
    try:
        plan = plan_tiling(edge, w_edge, t, icfg.image_size,
                           icfg.sequence_length, icfg.overlap_factor)
        rng = np.random.RandomState(0)
        field = rng.standard_normal((t, edge, w_edge, mcfg.in_channels))
        # Device-put once so the timed pass measures the engine, not the
        # host link (bench.py's inference_km2_per_sec does the same).
        field = jax.device_put(field.astype(np.float32))
        jax.block_until_ready(field)
        predictor = make_tiled_predictor(mcfg, icfg, plan)
        key = jax.random.key(0)

        def sync(x):
            # block_until_ready does NOT wait on the axon remote
            # platform (returns at dispatch); fetching one element is
            # the real barrier — and it also surfaces async OOMs that
            # would otherwise let a too-big domain "succeed".
            return float(jax.device_get(x[0, edge // 2, w_edge // 2, 0]))

        pred, _ = predictor(g_vars, field, key)   # compile + run
        sync(pred)
        t0 = time.perf_counter()
        pred, _ = predictor(g_vars, field, key)
        sync(pred)
        dt = time.perf_counter() - t0
        del pred, field
        return dt, None
    except Exception as e:  # XlaRuntimeError RESOURCE_EXHAUSTED, etc.
        msg = f"{type(e).__name__}: {e}"
        if not ("RESOURCE_EXHAUSTED" in msg or "HTTP 413" in msg
                or "memory" in msg.lower()):
            raise
        # HTTP 413 = the axon tunnel's remote-compile/transfer payload
        # cap, a harness transport limit, not chip HBM; recorded as its
        # own fail reason so the JSON distinguishes "chip full" from
        # "tunnel refused the payload" (a local chip would probe further).
        reason = ("tunnel_payload_limit" if "HTTP 413" in msg else "oom")
        print(f"  edge={edge}: DOES NOT FIT [{reason}] "
              f"({msg.splitlines()[0][:120]})")
        return None, reason
    finally:
        # Every probed plan leaves its predictor (and its device-resident
        # coverage map) in the engine's memo cache — seven probes pinned
        # ~4 GiB and OOM'd the streaming leg.  Each attempt must leave
        # the chip as it found it.
        from windtpu.infer.engine import clear_predictor_caches

        clear_predictor_caches()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=24)
    ap.add_argument("--aspect", type=float, default=1.0,
                    help="lon/lat edge ratio for probed domains (default "
                         "square); re-derive the streaming threshold at "
                         "other shapes (api.py probe-shape caveat)")
    ap.add_argument("--min-edge", type=int, default=512)
    ap.add_argument("--max-edge", type=int, default=4608)
    ap.add_argument("--out", default="docs/capacity_measured.json")
    args = ap.parse_args()

    from windtpu.utils.compilecache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from windtpu.api import _engine_hbm_bytes, flagship_config
    from windtpu.core.config import InferenceConfig
    from windtpu.models.generator import init_generator

    cfg = flagship_config()
    mcfg = cfg.model
    icfg = InferenceConfig(sequence_length=mcfg.sequence_length,
                           image_size=mcfg.image_size,
                           noise_channels=mcfg.noise_channels)
    g_vars = init_generator(mcfg, jax.random.key(0))
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")

    # Bracket then bisect on the square edge, snapping to multiples of 96
    # so the tiling plan stays dense.
    lo, hi = None, None          # lo = largest edge PROVEN to fit
    edge = args.min_edge
    results = {}
    fail_reasons = {}
    while edge <= args.max_edge:
        dt, why = _try_monolithic(edge, args.t, mcfg, icfg, g_vars,
                                  aspect=args.aspect)
        results[edge] = dt
        if why:
            fail_reasons[edge] = why
        # km²/s = domain area per wall second for the full T-hour cube —
        # the SAME definition as bench.py's inference_km2_per_sec.
        print(f"  edge={edge}: " +
              (f"{dt:.2f}s "
               f"({edge * _aspect_w(edge, args.aspect) / dt / 1e6:.2f}"
               f" M km²/s)"
               if dt else why))
        if dt is None:
            hi = edge
            break
        lo = edge
        edge *= 2
    if lo is None:
        # Even the smallest probed edge OOMs: there is no proven ceiling
        # to report — do NOT record min_edge as if it fit.
        print(f"  edge={args.min_edge} already OOMs; no monolithic "
              f"ceiling measured (retry with a smaller --min-edge)")
    elif hi is None:
        print(f"  no OOM up to edge={args.max_edge}; ceiling >= that")
        hi = args.max_edge
    else:
        while hi - lo > 192:
            mid = ((lo + hi) // 2) // 96 * 96
            if mid in (lo, hi):
                break
            dt, why = _try_monolithic(mid, args.t, mcfg, icfg, g_vars,
                                      aspect=args.aspect)
            results[mid] = dt
            if why:
                fail_reasons[mid] = why
            print(f"  edge={mid}: " + (f"{dt:.2f}s" if dt else why))
            if dt is None:
                hi = mid
            else:
                lo = mid

    ceiling_bytes = None
    if lo is not None:
        ceiling_bytes = _engine_hbm_bytes(args.t, lo,
                                          _aspect_w(lo, args.aspect),
                                          mcfg.in_channels,
                                          mcfg.out_channels)
        print(f"monolithic ceiling: {lo}x{_aspect_w(lo, args.aspect)} "
              f"@ T={args.t} "
              f"(domain tensors ~{ceiling_bytes / 2**30:.2f} GiB)")

    payload = {
        "device": dev.device_kind,
        "t": args.t,
        "aspect": args.aspect,
        "monolithic_max_edge": lo,   # None = nothing probed ever fit
        "monolithic_fail_edge": hi if results.get(hi, 0) is None else None,
        "fail_reasons": {str(k): v for k, v in fail_reasons.items()},
        "monolithic_domain_tensor_gib":
            round(ceiling_bytes / 2**30, 3) if ceiling_bytes else None,
        "probe_times_s": {str(k): round(v, 2) if v else v
                          for k, v in results.items()},
    }
    # Persist the monolithic search NOW: the streaming leg below moves
    # gigabytes over the host link and can outlive a harness timeout —
    # that must not lose the ceiling measurement.
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out} (monolithic search)")

    # Streaming past the ceiling: 1.5x the failing edge.
    from windtpu.infer.streaming import downscale_field_streaming

    s_edge = int((hi or args.min_edge) * 1.5) // 96 * 96
    rng = np.random.RandomState(1)
    field = rng.standard_normal(
        (args.t, s_edge, _aspect_w(s_edge, args.aspect),
         mcfg.in_channels)).astype(np.float32)
    t0 = time.perf_counter()
    out, _ = downscale_field_streaming(g_vars, field, mcfg, icfg,
                                       key=jax.random.key(1))
    s_dt = time.perf_counter() - t0
    s_rate = s_edge * s_edge / s_dt / 1e6   # domain area / s, as bench.py
    print(f"streaming {s_edge}x{s_edge} @ T={args.t}: {s_dt:.1f}s "
          f"({s_rate:.2f} M km²/s)")

    payload["streaming_edge"] = s_edge
    payload["streaming_s"] = round(s_dt, 2)
    payload["streaming_mkm2_per_s"] = round(s_rate, 3)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
