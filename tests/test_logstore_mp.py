"""Multi-PROCESS commit races for both LogStore backends (VERDICT r08
#5): the in-process race tests exercise the protocol, but `os.link`
and `fcntl.flock` semantics only fully bind across real processes —
flock is per-open-file-description and auto-releases on process death,
link atomicity is a kernel guarantee between independent writers.

Each worker is a separate Python process (spawn; no JVM involvement —
the race is on the manifest-log layer, `_commit` with no data files).
Asserted invariants, per backend:
- exactly one winner per version (the meta payload identifies the
  (worker, attempt) that owns each manifest);
- the version chain is contiguous 1..N with no gaps or duplicates;
- no torn manifests: every published file parses and its body version
  matches its filename;
- append-retry convergence: every worker lands every one of its
  commits despite conflicts.

Crash-window coverage for ConditionalPutLogStore: a writer that dies
BETWEEN the existence check and the rename (holding the flock) must
not deadlock the log — the OS releases the flock with the process —
and must not tear the target; its tmp file is inert debris that
_manifests never lists.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import re

import pytest


def _mp_commit_worker(args):
    """Top-level (spawn-picklable): race `n_commits` empty appends
    through the chosen backend, retrying on VersionConflict."""
    root, backend, n_commits, worker_id = args
    import sys

    sys.path.insert(0, "/root/repo")
    from aws_glue_data_catalog_replication_utility_spark import versioned as V

    if backend == "cput":
        V.set_log_store(V.ConditionalPutLogStore())
    wins = []
    for i in range(n_commits):
        for _attempt in range(500):
            try:
                v = V._commit(
                    root, "append", [], [], "{}",
                    {"worker": worker_id, "seq": i},
                )
                wins.append(v)
                break
            except V.VersionConflict:
                continue
        else:
            raise RuntimeError(f"worker {worker_id} starved at seq {i}")
    return wins


def _mp_crash_worker(root):
    """Acquire the conditional-put mutex, verify the target is absent,
    then DIE before the rename — the exact window between the
    existence check and the atomic move."""
    import fcntl

    log = os.path.join(root, "_txlog")
    os.makedirs(log, exist_ok=True)
    tmp = os.path.join(log, ".tmp-crashed-writer.json")
    with open(tmp, "w") as fh:
        fh.write("{\"version\": 1}")
    lk = open(os.path.join(log, ".commit.lock"), "a")
    fcntl.flock(lk, fcntl.LOCK_EX)
    assert not os.path.exists(os.path.join(log, "v000000000001.json"))
    os._exit(7)  # lock held, tmp debris left, target never created


@pytest.mark.parametrize("backend", ["posix", "cput"])
def test_multiprocess_commit_race_one_winner_per_version(
    tmp_path, backend
):
    n_workers, n_commits = 4, 8
    root = str(tmp_path / "t")
    ctx = mp.get_context("spawn")
    with ctx.Pool(n_workers) as pool:
        results = pool.map(
            _mp_commit_worker,
            [(root, backend, n_commits, w) for w in range(n_workers)],
        )

    # convergence: every worker landed every commit
    assert [len(r) for r in results] == [n_commits] * n_workers
    # one winner per version, contiguous chain
    all_vs = sorted(v for r in results for v in r)
    assert all_vs == list(range(1, n_workers * n_commits + 1))

    # no torn manifests; each manifest's meta names exactly one owner
    log = os.path.join(root, "_txlog")
    owners = {}
    for name in sorted(os.listdir(log)):
        m = re.fullmatch(r"v(\d{12})\.json", name)
        if not m:
            continue
        with open(os.path.join(log, name)) as fh:
            body = json.load(fh)  # parses = not torn
        assert body["version"] == int(m.group(1))
        owners[body["version"]] = (
            body["meta"]["worker"], body["meta"]["seq"]
        )
    assert len(owners) == n_workers * n_commits
    # ownership is a bijection: every (worker, seq) appears exactly once
    assert len(set(owners.values())) == n_workers * n_commits
    # and agrees with what each worker believes it won
    for w, wins in enumerate(results):
        for i, v in enumerate(wins):
            assert owners[v] == (w, i)
    # no leftover tmp files (losers cleaned up after themselves)
    assert not [n for n in os.listdir(log) if n.startswith(".tmp-")]


def test_conditional_put_crash_window_releases_lock(tmp_path):
    """Kill a ConditionalPutLogStore writer between existence check
    and rename: the flock dies with the process (no deadlock), the
    target is never torn, the tmp debris is inert, and subsequent
    writers proceed normally."""
    import sys

    sys.path.insert(0, "/root/repo")
    from aws_glue_data_catalog_replication_utility_spark import versioned as V

    root = str(tmp_path / "t")
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_mp_crash_worker, args=(root,))
    p.start()
    p.join(60)
    assert p.exitcode == 7

    log = os.path.join(root, "_txlog")
    # window left debris but no target
    assert os.path.exists(os.path.join(log, ".tmp-crashed-writer.json"))
    assert not os.path.exists(os.path.join(log, "v000000000001.json"))
    # _manifests never lists dotfiles: the debris is invisible to replay
    assert V._manifests(root) == []

    # the lock died with the process: a full multi-process race over
    # the same log completes (would deadlock forever if flock leaked)
    with ctx.Pool(2) as pool:
        results = pool.map(
            _mp_commit_worker, [(root, "cput", 4, w) for w in range(2)]
        )
    assert sorted(v for r in results for v in r) == list(range(1, 9))
