"""MapReduce compatibility layer tests: the reference's user contract
(mapper -> list[(k,v)], combiner/reducer see full value iterables,
reference count_functions.py:1-17, tasktracker.py:209-271) plus the
dual-mode agreement property from SURVEY.md section 7."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from simplemapreduceframework_spark.compat import (
    LocalClient,
    MapReduceJob,
    load_functions,
)

FUNCTIONS_SRC = """
def mapper(key, value):
    return [(w, 1) for w in value.split()]

def combiner(key, values):
    return key, sum(values)

def reducer(key, values):
    return key, sum(values)
"""

DATA = "hello world hello\n\nspark spark spark\nhello\n"


@pytest.fixture(scope="module")
def job_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("mrjob")
    (d / "functions.py").write_text(FUNCTIONS_SRC)
    (d / "data.txt").write_text(DATA)
    return str(d / "data.txt"), str(d / "functions.py")


def test_local_client_end_to_end(spark, job_files):
    data, functions = job_files
    client = LocalClient(spark, data, functions)
    result = sorted(client.execute())
    assert result == [("hello", 3), ("spark", 3), ("world", 1)]


def test_local_client_result_cache(spark, job_files):
    """Job dedup (O11): identical (data, functions) short-circuits
    (reference client.py:57-69, jobtracker.py:157-167)."""
    data, functions = job_files
    client = LocalClient(spark, data, functions)
    first = client.execute()
    assert client.execute() is first  # same cached object, no recompute


def test_modes_agree_for_associative_functions(spark, job_files):
    data, functions = job_files
    mapper, reducer, combiner = load_functions(functions)
    lines = spark.sparkContext.textFile(data)
    faithful = sorted(
        MapReduceJob(spark, mapper, reducer, combiner, mode="faithful").run_rdd(lines).collect()
    )
    fast = sorted(
        MapReduceJob(spark, mapper, reducer, combiner, mode="fast").run_rdd(lines).collect()
    )
    assert faithful == fast


def test_mapper_only_job(spark, job_files):
    _, functions = job_files
    mapper, _, _ = load_functions(functions)
    out = sorted(MapReduceJob(spark, mapper).run(["a b a"]))
    assert out == [("a", 1), ("a", 1), ("b", 1)]


def test_invalid_modes_rejected(spark, job_files):
    _, functions = job_files
    mapper, _, _ = load_functions(functions)
    with pytest.raises(ValueError):
        MapReduceJob(spark, mapper, mode="turbo")
    with pytest.raises(ValueError):
        MapReduceJob(spark, mapper, mode="fast")  # fast requires reducer


def test_empty_input(spark, job_files):
    _, functions = job_files
    mapper, reducer, combiner = load_functions(functions)
    assert MapReduceJob(spark, mapper, reducer, combiner).run([]) == []


def test_non_associative_reducer_faithful_semantics(spark):
    """Faithful mode must give the reducer the COMPLETE value list per
    key (reference tasktracker.py:237-255: one shuffle file per key,
    reducer sees every value) — demonstrated with a non-associative
    reducer (count of values) that fast mode could not honor."""

    def mapper(key, value):
        return [(w, 1) for w in value.split()]

    def reducer(key, values):
        return key, len(list(values))  # count of distinct map emissions

    lines = ["a a b", "a b b", "c"]
    out = dict(MapReduceJob(spark, mapper, reducer, mode="faithful").run(lines))
    # no combiner: reducer sees every (k, 1) emission
    assert out == {"a": 3, "b": 3, "c": 1}


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=8).map(" ".join),
        min_size=0,
        max_size=10,
    )
)
def test_wordcount_property_vs_python_oracle(spark_global, lines):
    """Property: compat wordcount == collections.Counter oracle for any
    input corpus (the reference's oracle pattern, counting_words.py:15-36)."""

    def mapper(key, value):
        return [(w, 1) for w in value.split()]

    def combiner(key, values):
        return key, sum(values)

    def reducer(key, values):
        return key, sum(values)

    expected = Counter(w for line in lines for w in line.split())
    got = dict(
        MapReduceJob(spark_global, mapper, reducer, combiner, mode="faithful").run(
            list(lines)
        )
    )
    assert got == dict(expected)


@pytest.fixture(scope="session")
def spark_global(spark):
    # hypothesis can't use function-scoped fixtures; alias the session one
    return spark


def test_dog_csv_table_mode(spark, tmp_path):
    """The reference's documented SQL recipe end-to-end through
    LocalClient in 'table' mode (README.md:25-36): headerless CSV,
    positional columns, mapper emits (dog,(age,1)), combiner partial-
    sums, reducer finishes — result equals AVG(age) GROUP BY dog."""
    csv = tmp_path / "dog.csv"
    rows = [("rex", 2), ("rex", 4), ("bella", 1), ("rex", 3), ("max", 10), ("bella", 3)]
    csv.write_text("".join(f"{d},{a}\n" for d, a in rows))
    fn = tmp_path / "dog_functions.py"
    fn.write_text(
        "def mapper(key, value):\n"
        "    cols = value.split(',')\n"
        "    return [(cols[0], (int(cols[1]), 1))]\n"
        "def combiner(key, values):\n"
        "    return key, (sum(v[0] for v in values), sum(v[1] for v in values))\n"
        "def reducer(key, values):\n"
        "    s = sum(v[0] for v in values); c = sum(v[1] for v in values)\n"
        "    return key, s / c\n"
    )
    result = dict(
        LocalClient(spark, str(csv), str(fn), data_type="table").execute()
    )
    assert result == {"rex": 3.0, "bella": 2.0, "max": 10.0}


def test_secondary_sort(spark):
    """Secondary sort: reducer sees values in sorted order without an
    in-memory per-key sort (repartitionAndSortWithinPartitions)."""
    import random

    rng = random.Random(7)
    rows = [(f"k{i % 5}", rng.randint(0, 1000)) for i in range(500)]

    def mapper(key, value):
        k, v = value.split(",")
        return [(k, int(v))]

    def reducer(key, values):
        vals = list(values)
        assert vals == sorted(vals), f"values not sorted for {key}"
        return key, (vals[0], vals[-1], len(vals))

    lines = [f"{k},{v}" for k, v in rows]
    got = dict(
        MapReduceJob(spark, mapper, reducer, sort_values=True).run(lines)
    )
    expected = {}
    for k, v in rows:
        expected.setdefault(k, []).append(v)
    for k, vals in expected.items():
        vals.sort()
        assert got[k] == (vals[0], vals[-1], len(vals))


def test_secondary_sort_requires_faithful(spark):
    def mapper(key, value):
        return [(value, 1)]

    def reducer(key, values):
        return key, sum(values)

    with pytest.raises(ValueError):
        MapReduceJob(spark, mapper, reducer, mode="fast", sort_values=True)


def test_local_client_missing_files(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        LocalClient(spark, str(tmp_path / "nope.txt"), str(tmp_path / "f.py"))


PICKLE_FUNCTIONS_SRC = """
def mapper(key, value):
    # byte-mode records are python objects, not text lines
    return [(value["breed"], (value["age"], 1))]

def combiner(key, values):
    return key, (sum(v[0] for v in values), sum(v[1] for v in values))

def reducer(key, values):
    s = sum(v[0] for v in values); c = sum(v[1] for v in values)
    return key, s / c
"""


def test_pickle_record_reader_sequential_frames(spark, tmp_path):
    """Byte-mode record reader (reference tasktracker.py:48-51,111-117):
    sequential pickle.dump frames in one file, one record each."""
    import pickle

    from simplemapreduceframework_spark.compat.mapreduce import (
        read_pickled_records,
    )

    rows = [{"breed": "rex", "age": 2}, {"breed": "rex", "age": 4}, {"breed": "max", "age": 10}]
    f = tmp_path / "dogs.pkl"
    with f.open("wb") as fh:
        for r in rows:
            pickle.dump(r, fh)
    got = read_pickled_records(spark, str(f)).collect()
    assert sorted(got, key=lambda r: (r["breed"], r["age"])) == sorted(
        rows, key=lambda r: (r["breed"], r["age"])
    )


def test_pickle_record_reader_single_list(spark, tmp_path):
    """A single pickled list becomes one record per element (the
    reference's data_handler.py:271-298 slice model)."""
    import pickle

    f = tmp_path / "list.pkl"
    f.write_bytes(pickle.dumps([1, 2, 3, 4]))
    from simplemapreduceframework_spark.compat.mapreduce import (
        read_pickled_records,
    )

    assert sorted(read_pickled_records(spark, str(f)).collect()) == [1, 2, 3, 4]


def test_local_client_pickle_mode(spark, tmp_path):
    """End-to-end byte-mode compat job: pickled dict records through
    mapper/combiner/reducer."""
    import pickle

    rows = [
        {"breed": "rex", "age": 2},
        {"breed": "rex", "age": 4},
        {"breed": "bella", "age": 3},
    ]
    data = tmp_path / "dogs.pkl"
    with data.open("wb") as fh:
        for r in rows:
            pickle.dump(r, fh)
    fn = tmp_path / "functions.py"
    fn.write_text(PICKLE_FUNCTIONS_SRC)
    result = dict(
        LocalClient(spark, str(data), str(fn), data_type="pickle").execute()
    )
    assert result == {"rex": 3.0, "bella": 3.0}


def test_local_client_persistent_cache(spark, job_files, tmp_path):
    """Cross-session result cache: a NEW client instance with the same
    cache_dir short-circuits from disk (reference persists finished job
    results keyed by content-hash id, jobtracker.py:157-167)."""
    data, functions = job_files
    cache = tmp_path / "jobcache"
    first = LocalClient(spark, data, functions, cache_dir=cache).execute()
    assert list(cache.glob("*.pkl")), "cache file not written"
    # fresh instance — in-memory cache empty, must load from disk
    client2 = LocalClient(spark, data, functions, cache_dir=cache)
    assert sorted(client2.execute()) == sorted(first)
    # different mode => different job id => not a cache hit shape-wise
    assert LocalClient(spark, data, functions, cache_dir=cache)._job_id() == (
        LocalClient(spark, data, functions, cache_dir=cache)._job_id()
    )


def test_local_client_progress_callback(spark, job_files):
    """Progress reporting parity (reference client.py:291-304 tqdm
    daemon): execute(progress=cb) invokes cb with per-stage task counts
    while the job runs."""
    data, functions = job_files
    seen: list[list[dict]] = []
    # fresh functions content to defeat the result cache? job_files is
    # shared — use a distinct client with no cache dir and clear memory
    client = LocalClient(spark, data, functions)
    client.execute(progress=seen.append)
    # The job is tiny, so the poller may or may not catch an active
    # stage; assert the callback contract, not timing: every reported
    # entry has the stage-progress shape.
    for batch in seen:
        for info in batch:
            assert {"stage", "num_tasks", "completed", "active", "failed"} <= set(info)


def test_functions_file_without_mapper_rejected(spark, tmp_path):
    """A functions file with no mapper must fail fast with a clear
    error (the reference's contract requires mapper; reducer/combiner
    are optional)."""
    fn = tmp_path / "bad_functions.py"
    fn.write_text("def reducer(key, values):\n    return key, sum(values)\n")
    with pytest.raises(ValueError, match="mapper"):
        load_functions(str(fn))


def test_load_functions_rejects_wrong_arity(tmp_path):
    """A functions file with the wrong signature must fail at LOAD time
    with an identified error, not as an opaque TypeError inside a Spark
    worker once the job is already running."""
    bad = tmp_path / "bad_functions.py"
    bad.write_text(
        "def mapper(line):\n"
        "    return [(w, 1) for w in line.split()]\n"
        "def reducer(key, values):\n"
        "    return key, sum(values)\n"
    )
    with pytest.raises(ValueError, match=r"mapper\(\) must take exactly"):
        load_functions(str(bad))


def test_local_client_remove_job(spark, tmp_path):
    """remove_job (reference client.py:370-387) invalidates both the
    in-memory and persistent caches; the next execute recomputes and
    repopulates."""
    from simplemapreduceframework_spark.compat.mapreduce import LocalClient

    data = tmp_path / "data.txt"
    data.write_text("a b a\n")
    funcs = tmp_path / "functions.py"
    funcs.write_text(
        "def mapper(key, value):\n"
        "    return [(w, 1) for w in value.split()]\n"
        "def reducer(key, values):\n"
        "    return (key, sum(values))\n"
    )
    cache = tmp_path / "cache"
    c = LocalClient(spark, str(data), str(funcs), cache_dir=str(cache))
    first = sorted(c.execute())
    assert first == [("a", 2), ("b", 1)]
    assert list(cache.glob("*.pkl"))
    assert c.remove_job() is True
    assert not list(cache.glob("*.pkl"))
    assert c.remove_job() is False  # nothing left to remove
    assert sorted(c.execute()) == first  # recompute repopulates
    assert list(cache.glob("*.pkl"))


def test_local_client_from_outside_repo_cwd(tmp_path):
    """Reference-style usage runs from an arbitrary directory: the
    user's functions.py is dynamically imported, so its mapper/
    combiner/reducer must pickle BY VALUE to executors — a module
    pickled by reference would fail to resolve in a worker whose
    sys.path/cwd never saw the user's directory. Runs a whole job in a
    subprocess with cwd=/ (outside the repo AND outside the job dir),
    the scenario the verify runbook previously checked by hand."""
    import os
    import subprocess
    import sys

    (tmp_path / "functions.py").write_text(FUNCTIONS_SRC)
    (tmp_path / "data.txt").write_text(DATA)
    script = tmp_path / "run_job.py"
    script.write_text(
        "import sys\n"
        f"sys.path.insert(0, {str('/root/repo')!r})\n"
        "from simplemapreduceframework_spark import get_spark\n"
        "from simplemapreduceframework_spark.compat import LocalClient\n"
        "spark = get_spark('compat-outside-cwd', cpus=2)\n"
        f"client = LocalClient(spark, {str(tmp_path / 'data.txt')!r}, "
        f"{str(tmp_path / 'functions.py')!r})\n"
        "print(sorted(client.execute()))\n"
    )
    out = subprocess.run(
        [sys.executable, str(script)],
        cwd="/",
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert (
        "[('hello', 3), ('spark', 3), ('world', 1)]" in out.stdout
    ), out.stdout
