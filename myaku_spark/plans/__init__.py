"""End-to-end pipelines: resumable checkpointed index build, incremental
re-index, rescore."""
