"""Port of the reference's readme_example
(`/root/reference/examples/readme_example.rs`) plus the distributed
equivalent. Run: python examples/readme_example.py"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ddsketchy_spark import DDSketch


def local_example() -> None:
    # Create a new sketch with 1% relative error
    sketch = DDSketch(alpha=0.01)

    # Add some values
    for v in (1.0, 2.0, 3.0, 4.0, 5.0):
        sketch.add(v)

    print(f"Median: {sketch.quantile(0.5)}")  # ~2.97 (the Go golden float)
    print(f"P90:    {sketch.quantile(0.9)}")  # ~4.01
    print(f"count={sketch.count} sum={sketch.sum} mean={sketch.mean}")

    # Distributed pattern: merge sketches built on disjoint data
    other = DDSketch(alpha=0.01)
    other.add_batch([6.0, 7.0, 8.0])
    sketch.merge(other)
    print(f"after merge: count={sketch.count} median={sketch.quantile(0.5)}")


def spark_example() -> None:
    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_quantiles
    from ddsketchy_spark.spark.session import get_spark

    spark = get_spark("readme-example", master="local[4]")
    df = spark.createDataFrame([(float(v),) for v in range(1, 1001)], "x double")
    out = ddsketch_quantiles(df, "x", quantiles=(0.5, 0.99))
    print(f"distributed: {out}")
    spark.stop()


if __name__ == "__main__":
    local_example()
    if "--spark" in sys.argv:
        spark_example()
