"""Port of the reference's serialization examples
(`/root/reference/examples/compare_serialization.rs`,
`readme_serde_example.rs`): JSON shape (empty sketch encodes min/max as
null), round-trip identity, continue-adding-after-restore.
Run: python examples/serialization_example.py"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ddsketchy_spark import DDSketch


def main() -> None:
    print("=== DDSketch Serialization Comparison ===\n")

    empty = DDSketch(0.01)
    print("Empty sketch (min/max as null):")
    print(json.dumps(json.loads(empty.to_json()), indent=2)[:300], "...\n")

    sk = DDSketch(0.01)
    for v in (1.0, 100.0, 0.01):
        sk.add(v)
    print("Sketch with data (min/max as numbers):")
    d = json.loads(sk.to_json())
    print({k: d[k] for k in ("alpha", "count", "sum", "min", "max")}, "\n")

    # JSON round-trip
    restored = DDSketch.from_json(sk.to_json())
    assert restored.count == sk.count
    assert abs(restored.min - sk.min) < 1e-10
    assert restored.quantile(0.5) == sk.quantile(0.5)
    print("JSON round-trip: OK")

    # binary round-trip + continue adding (checkpoint/resume semantics)
    blob = sk.to_bytes()
    resumed = DDSketch.from_bytes(blob)
    sk.add_batch(range(1, 101))
    resumed.add_batch(range(1, 101))
    assert resumed == sk
    print(f"binary round-trip + continue adding: OK ({len(blob)} bytes)")


if __name__ == "__main__":
    main()
