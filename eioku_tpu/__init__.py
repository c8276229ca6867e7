"""eioku_tpu — TPU-native semantic video search platform.

A brand-new framework with the capabilities of codihuston/eioku (reference mounted at
/root/reference): video discovery, seven ML analysis task types fanned out through a
durable job queue, versioned artifact envelopes with full provenance, FTS + navigation
projections, a REST API serving a video player, and — new in this rebuild — a semantic
embedding + top-k retrieval layer running on TPU via JAX/XLA/Pallas.

Unlike the reference (FastAPI + SQLAlchemy + Redis/arq + torch/CUDA), this framework is
self-contained: it ships its own ASGI micro web framework (`eioku_tpu.web`), its own
sqlite-backed persistence layer with migrations (`eioku_tpu.db`), its own durable job
queue (`eioku_tpu.queue`), and a JAX/Pallas compute engine (`eioku_tpu.ml`,
`eioku_tpu.models`, `eioku_tpu.ops`) designed TPU-first.
"""

__version__ = "0.1.0"
