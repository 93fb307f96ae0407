"""evlake — a PySpark-native lakehouse analytics engine.

Re-implements, Spark-first, the capability surface of the reference
medallion ETL pipeline (`jorgemartins1986/
EV_Charging_Sessions_Orchestrated_Lakehouse_Pipeline`): bronze CSV
ingest, silver cleaning + data-quality gate + quarantine split, gold
fact table with idempotent partition overwrite, and the declared
analytics metrics — plus the LLM-data-pipeline operator family
(dedup, similarity search, text analysis, multimodal columns) that a
100 TB training-data pipeline needs.

Design stance (SURVEY.md §7.0): pure DataFrame/SQL API, zero custom
Catalyst rules; Catalyst does pushdown/pruning/join-selection, we do
semantics. Every operator is written so the physical plan is the one
you'd want on a 1000-executor cluster: broadcast for dims, single-pass
aggregation for quality metrics, map-side-combinable aggs, no
driver-side loops.
"""

__version__ = "0.1.0"
