"""Structured Streaming re-model of the reference's collection tier
(SURVEY.md §2.9, §3.3).

The reference polls the station feed from cron every 3 minutes into
PostgreSQL and maintains a 15-minute rollup plus an upserted station
dimension (reference README.md:182-224). Here that is one streaming
topology: micro-batches replace cron, the checkpoint directory replaces
the hand-rolled CSV/iloc resume logic (README.md:714-746), and a
watermark handles the feed's stale ``last_communication_time``.
"""
