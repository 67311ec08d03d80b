"""ssufid_ray — a Ray-Data-native crawl / data-processing engine.

A from-scratch reimplementation (NOT a port) of the capabilities of
yourssu/ssufid (surveyed in /root/repo/SURVEY.md): a URL frontier + fetch
scheduler with per-host politeness, robots gating, a priority heap keyed by
(board, posted_date desc), a sharded bloom-then-cuckoo URL-seen set
partitioned by host-hash, plugin-per-board parser strategies producing
ordered span sequences (text interleaved with image/attachment media refs),
incremental merge-upsert, RSS/ICS rendering, and per-partition
checkpoint/lineage — all expressed as ray.data.Dataset pipelines over
zero-copy Arrow batches with actor pools for stateful stages.

Library code never calls ray.init()/ray.shutdown(); sessions are owned by
the driver, bench.py, or the pytest fixture.
"""

__version__ = "0.1.0"
