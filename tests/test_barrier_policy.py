"""The engine-wide barrier storage policy (session.barrier_level)."""

from __future__ import annotations

import pytest
from pyspark.storagelevel import StorageLevel

from entity_linking_in_biomedical_spark.session import barrier_level


def test_default_is_serialized(monkeypatch):
    monkeypatch.delenv("EL_SPARK_BARRIER_LEVEL", raising=False)
    assert barrier_level() == StorageLevel.MEMORY_AND_DISK


def test_env_selects_level(monkeypatch):
    monkeypatch.setenv("EL_SPARK_BARRIER_LEVEL", "deser")
    assert barrier_level() is None  # pyspark's deserialized default
    monkeypatch.setenv("EL_SPARK_BARRIER_LEVEL", "disk")
    assert barrier_level() == StorageLevel.DISK_ONLY


def test_unknown_level_raises_actionably(monkeypatch):
    monkeypatch.setenv("EL_SPARK_BARRIER_LEVEL", "turbo")
    with pytest.raises(ValueError, match="turbo.*deser.*disk.*ser"):
        barrier_level()
