"""Physical-plan helpers: scalable id assignment, stage checkpointing."""
