"""PySpark-native analytics engine with the query and data-processing
capabilities of InformaticsMatters/squonk2-fastapi-ws-event-stream.

The reference (/root/reference) is an event-stream relay: RabbitMQ streams ->
enrichment -> WebSocket, with a registry table and offset/time-travel replay
(see SURVEY.md). This package re-expresses that capability surface — plus the
LLM-data-pipeline extensions (dedup, similarity search, multimodal columns,
text analysis) — Spark-first:

- ``sources/``    custom streaming DataSource ("eventstream") + registry table
- ``operators/``  enrichment, replay, dedup, similarity, text stats, multimodal
- ``functions/``  reusable column-expression builders (hashing, text, vectors)
- ``plans/``      relational query plans over the TPC-H-ish test tables
- ``streaming/``  Structured Streaming pipeline + FastAPI control plane
"""

__version__ = "0.1.0"
