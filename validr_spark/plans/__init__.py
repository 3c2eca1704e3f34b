"""Execution plans: resumable, manifest-checkpointed validation runs."""

from .manifest import ManifestStore, ResumableValidation, lineage_hash

__all__ = ["ManifestStore", "ResumableValidation", "lineage_hash"]
