"""SQL surface + physical-plan inspection.

The reference shipped the Flink Table/Blink planner dependency but never used
it (gmall-realtime/pom.xml:167-177). On Spark the SQL layer is native:
views.py exposes every pipeline as a SQL view, and inspect.py gives the
tests a way to assert the physical plans actually have the shape a 100 TB
deployment needs (filters pushed into the parquet scan, pruned read schemas,
broadcast dim joins, whole-stage codegen).
"""
