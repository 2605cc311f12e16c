"""Kill/resume semantics of the partition-checkpointed sink (FIXTURES.md
§4.5 resume invariant; ref analog: task_health re-publisher,
``task_health.py:82-134``)."""
import os

import pyarrow.parquet as pq
import pytest

from text_extraction_system_ray.state.checkpoint import (
    committed_partitions, job_metrics, read_output, run_checkpointed)


@pytest.fixture()
def sharded_input(tmp_path, tiny_corpus):
    files = []
    n = tiny_corpus.num_rows
    shard = n // 4
    for i in range(4):
        t = tiny_corpus.slice(i * shard, shard if i < 3 else n - 3 * shard)
        p = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(t, p)
        files.append(p)
    return files


def test_kill_and_resume(ray_session, sharded_input, tmp_path):
    out = str(tmp_path / "out")
    # phase 1: "crash" after 2 partitions
    done1 = run_checkpointed(sharded_input, out, stop_after=2)
    assert len(done1) == 2
    assert committed_partitions(out) == set(done1)
    mtimes = {pid: os.path.getmtime(os.path.join(out, "_manifest", f"{pid}.json"))
              for pid in done1}
    # phase 2: resume — finishes the rest, does not recompute committed parts
    done2 = run_checkpointed(sharded_input, out)
    assert set(done1).isdisjoint(done2)
    assert len(committed_partitions(out)) == 4
    for pid in done1:
        assert os.path.getmtime(
            os.path.join(out, "_manifest", f"{pid}.json")) == mtimes[pid]
    # full output equals a fresh single-shot run
    out2 = str(tmp_path / "out2")
    run_checkpointed(sharded_input, out2)
    a = {r["url"]: r["text"] for r in read_output(out).take_all()}
    b = {r["url"]: r["text"] for r in read_output(out2).take_all()}
    assert a == b
    m = job_metrics(out)
    assert m["partitions"] == 4
    assert m["rows"] == read_output(out).count() != 0


def test_uncommitted_partials_cleaned(ray_session, sharded_input, tmp_path):
    out = str(tmp_path / "out")
    run_checkpointed(sharded_input, out, stop_after=1)
    # simulate a crash mid-write: stray part dir without manifest
    stray = os.path.join(out, "part-99999")
    os.makedirs(stray, exist_ok=True)
    open(os.path.join(stray, "junk.parquet"), "w").close()
    run_checkpointed(sharded_input, out)
    assert not os.path.isdir(stray)
    assert len(committed_partitions(out)) == 4


def test_read_output_before_first_commit(ray_session, sharded_input, tmp_path):
    """Reading an out_dir with zero committed partitions (status probe
    right after a crash) returns an empty dataset, not an exception."""
    out = str(tmp_path / "out")
    run_checkpointed(sharded_input, out, stop_after=0)
    ds = read_output(out)
    assert ds.count() == 0
    assert "url" in ds.schema().names and "text" in ds.schema().names


def test_overlapped_partitions_match_serial(ray_session, sharded_input, tmp_path):
    """max_concurrent>1 overlaps partition pipelines; commits stay atomic
    and per-partition, output identical to the serial run."""
    out_serial = str(tmp_path / "out_serial")
    out_conc = str(tmp_path / "out_conc")
    run_checkpointed(sharded_input, out_serial)
    done = run_checkpointed(sharded_input, out_conc, max_concurrent=4)
    assert len(done) == 4
    assert len(committed_partitions(out_conc)) == 4
    a = {r["url"]: r["text"] for r in read_output(out_serial).take_all()}
    b = {r["url"]: r["text"] for r in read_output(out_conc).take_all()}
    assert a == b
    # resume after overlap-crash: drop one manifest, re-run concurrently
    victim = sorted(committed_partitions(out_conc))[1]
    os.remove(os.path.join(out_conc, "_manifest", f"{victim}.json"))
    redone = run_checkpointed(sharded_input, out_conc, max_concurrent=4)
    assert redone == [victim]
    b2 = {r["url"]: r["text"] for r in read_output(out_conc).take_all()}
    assert a == b2


def test_changed_input_plan_refused(ray_session, sharded_input, tmp_path):
    out = str(tmp_path / "out")
    run_checkpointed(sharded_input, out, stop_after=1)
    # same files, different grouping → refused
    with pytest.raises(ValueError, match="different input plan"):
        run_checkpointed(sharded_input, out, files_per_partition=2)
    # different file set → refused
    with pytest.raises(ValueError, match="different input plan"):
        run_checkpointed(sharded_input[:-1], out)
    # identical plan → resumes fine
    done = run_checkpointed(sharded_input, out)
    assert len(committed_partitions(out)) == 4
