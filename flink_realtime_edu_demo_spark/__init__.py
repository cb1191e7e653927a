"""PySpark-native analytics engine with the query/data-processing
capabilities of the ``Enzonna/Flink-realtime-edu-Demo`` reference family.

The reference repo (snapshot at /root/reference) is a single one-line
README (``README.md:1``); the semantic contract is therefore the public
Apache Flink API surface (DataStream + Table/SQL) reconstructed in
SURVEY.md, plus the driver-mandated LLM-data-pipeline extension.

Architecture (SURVEY.md §3.4): a thin Python layer composing PySpark
DataFrame transformations. No custom planner, scheduler, or state
backend — Catalyst + Tungsten + Structured Streaming are the runtime.
Every operator is a function ``(spark, sf_dir) -> DataFrame`` usable in
both batch and streaming mode.
"""

__version__ = "0.1.0"
