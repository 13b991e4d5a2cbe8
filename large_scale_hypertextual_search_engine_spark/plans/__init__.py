"""Stage orchestration: checkpoint/resume, lineage, metrics."""
