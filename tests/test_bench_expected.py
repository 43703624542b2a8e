"""bench.py regression tracking: committed expected values with
tolerances, compared on every full bench run (VERDICT r2 item 3)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import check_regressions  # noqa: E402

# r02 measured figures, extended with the streaming-path figures the
# bench gained in r04/r05 (a full result must carry every expected key
# or check_regressions flags it as a crashed section).  The streaming
# values are r5 quiet-machine measurements of the pipelined engine.
R02 = {"value": 2.3169, "flagship_steps_per_sec": 5.6281,
       "inference_km2_per_sec": 2878791.4, "mfu": 0.0921,
       "inference_km2_per_sec_streaming": 46973.0,
       "inference_km2_per_sec_streaming_bf16": 87752.0,
       "parallel": {"dp_efficiency": 1.045, "tile_efficiency": 0.915}}


def test_expected_file_is_valid_and_r02_green():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_EXPECTED.json")
    with open(path) as f:
        spec = json.load(f)
    assert any(not k.startswith("_") for k in spec)
    # The round-2 measured numbers must be inside their own tolerances.
    assert check_regressions(R02) == []


def test_slowdown_is_flagged():
    bad = dict(R02, value=1.5)
    regs = check_regressions(bad)
    assert any(r.startswith("value:") for r in regs)


def test_faster_is_not_flagged():
    fast = dict(R02, value=9.9, inference_km2_per_sec=9e6)
    assert check_regressions(fast) == []


def test_missing_section_is_flagged():
    regs = check_regressions(dict(R02, parallel=None))
    assert any("missing" in r for r in regs)


def test_intentionally_skipped_sections_are_green():
    """--no-parallel / unknown-FLOPS devices legitimately omit sections;
    those must not poison the 'empty = green' signal (while a crashed
    section — not in skip_prefixes — still flags, above)."""
    result = dict(R02, parallel=None, mfu=None)
    assert check_regressions(result, skip_prefixes=("parallel.", "mfu")) == []
    # Skipping one section does not mute the others.
    bad = dict(result, value=1.5)
    regs = check_regressions(bad, skip_prefixes=("parallel.", "mfu"))
    assert any(r.startswith("value:") for r in regs)
