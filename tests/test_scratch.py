"""Session-keyed scratch state (VERDICT r2 'what's wrong #3'): engines must
be keyed by applicationId, not id(spark), and a restarted context must get
a fresh entry with the stale one evicted."""

from __future__ import annotations

import os

from olympia_spark.operators._scratch import (_TEMP_DIRS, get_or_create,
                                              scratch_dir)


class _FakeSC:
    def __init__(self, app_id):
        self.applicationId = app_id


class _FakeSpark:
    def __init__(self, app_id):
        self.sparkContext = _FakeSC(app_id)


def test_restarted_session_gets_fresh_engine_and_stale_entry_evicted():
    cache: dict = {}
    made = []

    def factory():
        made.append(object())
        return made[-1]

    s1 = _FakeSpark("app-1")
    e1 = get_or_create(cache, s1, "sf", factory)
    assert get_or_create(cache, s1, "sf", factory) is e1
    assert len(made) == 1
    # same process, new SparkContext (id(spark) could collide here — the
    # applicationId cannot): fresh engine, old entry evicted
    s2 = _FakeSpark("app-2")
    e2 = get_or_create(cache, s2, "sf", factory)
    assert e2 is not e1 and len(made) == 2
    assert list(cache) == [("app-2", "sf")]


def test_scratch_dirs_registered_for_cleanup():
    d = scratch_dir("olympia_test_scratch_")
    assert os.path.isdir(d) and d in _TEMP_DIRS
