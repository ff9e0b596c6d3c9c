"""Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY §4: the JAX-standard way to
exercise multi-chip sharding without a pod).  This environment preimports jax
via a sitecustomize hook with the TPU-tunnel platform pinned, so plain env
vars are too late — the platform must be flipped through jax.config before
the first backend use.  Real-TPU benchmarking lives in bench.py, not here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# LLVM opt level pinned to 2 — do NOT lower it to speed up the suite's
# compiles: levels 0 and 1 break XLA:CPU collective execution in a long
# process (the full suite reproducibly dies with a silent SIGABRT inside
# a virtual-device collective — always a ring-sharded predict around
# test #225 — while the same tests pass solo or in smaller batches; five
# runs at -O0/-O1, zero at -O2).  A persistent compile cache is equally
# off-limits (see below).  Level 2 is green: 246 passed / 925 s.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

if os.environ.get("EPNN_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    # in-process CLI calls (tests/test_cli.py) key their compile-cache
    # policy on the effective platform; the env var makes the intent
    # explicit for any subprocess the suite spawns too
    os.environ.setdefault("EPNN_PLATFORM", "cpu")

# NO persistent compile cache for the suite.  It was tried (2× faster
# warm runs) and is UNSAFE with XLA:CPU virtual-device collectives in
# this jaxlib: a suite run that WRITES the cache passes, the next run
# that LOADS the cached AOT executables aborts (silent SIGABRT) at the
# first reused collective program (reproduced deterministically on
# tests/test_sharding.py; cpu_aot_loader's feature-mismatch E-lines are
# the tell).  Guard against ambient cache config leaking in:
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: long-running test whose coverage is substantially duplicated "
        "by cheaper tests or the driver dryrun; skipped by default, run with "
        "EPNN_CI=1 (round-3 verdict item 8: default suite < 8 min)")
    config.addinivalue_line(
        "markers",
        "isolate: run this test in a fresh pytest subprocess.  The general "
        "medicine (r4 verdict item 8) for the roaming XLA:CPU virtual-device "
        "collectives SIGABRT: executables of many DISTINCT collective "
        "programs interleaved in ONE process abort past a count threshold "
        "(silent, no F-log; jax.clear_caches/clear_backends do not dodge "
        "it — CLAUDE.md rounds 8/12).  Mark any test that stacks several "
        "distinct sharded programs or full train() loops; the test body "
        "stays a plain pytest test instead of a bespoke inline-code "
        "subprocess harness.")


def _isolated_runner(nodeid):
    """Body for an ``isolate``-marked test in the parent process: run the
    real test in a fresh ``pytest <nodeid>`` child and relay its outcome.
    Only the CALL phase is replaced — the parent's setup/teardown/fixture
    protocol runs normally, so pytest's lazy collector teardown chain
    stays consistent (a runtest_protocol-level bypass broke the NEXT
    test's setup with 'previous item was not torn down properly')."""

    def run(*_args, **_kwargs):
        import re
        import subprocess
        import sys

        env = dict(os.environ)
        env["EPNN_ISOLATE_CHILD"] = "1"
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "pytest", "-q",
                 "-p", "no:cacheprovider", nodeid],
                cwd=root, env=env, capture_output=True, text=True,
                timeout=1800)
        except subprocess.TimeoutExpired as e:
            pytest.fail(f"isolated child timed out after {e.timeout}s",
                        pytrace=False)
        out = proc.stdout + proc.stderr
        counts = {k: int(v) for v, k in
                  re.findall(r"(\d+) (passed|failed|error|skipped)", out)}
        if proc.returncode == 0 and counts.get("passed"):
            return
        if proc.returncode == 0 and counts.get("skipped"):
            pytest.skip("skipped in isolated child")
        pytest.fail("isolated child failed:\n" + out, pytrace=False)

    return run


def pytest_collection_modifyitems(config, items):
    if not os.environ.get("EPNN_ISOLATE_CHILD"):
        for item in items:
            if "isolate" in item.keywords and isinstance(
                    item, pytest.Function):
                item.obj = _isolated_runner(item.nodeid)
    if os.environ.get("EPNN_CI"):
        return
    skip = pytest.mark.skip(reason="heavy (set EPNN_CI=1 to run)")
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip)


REFERENCE_DIR = os.environ.get("EPNN_REFERENCE_DIR", "/root/reference")
NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)


def _build_native() -> None:
    """Build native/libepnn_native.so before collection so the 4 native
    bit-for-bit tests run by default instead of silently skipping.

    Skipping is only acceptable when no C++ toolchain exists; with a
    compiler present a broken build must FAIL the session loudly (the C++
    bundle/xyz readers' guarantees are only enforced when their tests run).
    """
    import shutil
    import subprocess

    lib = os.path.join(NATIVE_DIR, "libepnn_native.so")
    srcs = [os.path.join(NATIVE_DIR, f)
            for f in ("xyz_parser.cc", "bundle_reader.cc", "Makefile")]
    if not all(os.path.exists(s) for s in srcs):
        return  # packaged without sources — nothing to build
    if os.path.exists(lib) and all(
        os.path.getmtime(lib) >= os.path.getmtime(s) for s in srcs
    ):
        return
    cxx = os.environ.get("CXX", "g++")
    if shutil.which("make") is None or shutil.which(cxx) is None:
        return  # no toolchain: the native tests will skip (their contract)
    proc = subprocess.run(
        ["make", "-C", NATIVE_DIR], capture_output=True, text=True
    )
    if proc.returncode != 0:
        raise RuntimeError(
            "native/ build failed with a compiler present:\n"
            + proc.stdout + proc.stderr
        )


_build_native()
REFDATA_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             ".cache", "refdata")


@pytest.fixture(autouse=True)
def _clear_sharded_program_memos():
    """Drop the memoized sharded-forward programs after every test.

    The parallel forwards memoize their jitted shard_map programs
    (parallel/atom_shard.py, parallel/ring_shard.py) so serving loops and
    repeat calls within one test reuse ONE executable — that part is safe
    and fast.  But XLA:CPU virtual-device collective executables misbehave
    when many DISTINCT collective programs interleave in one process (the
    known SIGABRT artifact, CLAUDE.md): letting the memo carry executables
    ACROSS tests reproduces it (full-suite abort at a later reuse; the
    same file solo passes).  Scope the reuse to one test on the CPU mesh."""
    yield
    import sys

    for mod, names in (
        ("epnn_tpu.parallel.atom_shard",
         ("_nbr_batch_program", "_dense_batch_program")),
        ("epnn_tpu.parallel.ring_shard",
         ("_ring_nbr_program", "_ring_dense_program")),
    ):
        m = sys.modules.get(mod)
        if m is not None:
            for name in names:
                getattr(m, name).cache_clear()


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def _ensure_extracted(name: str) -> str:
    """Extract a reference dataset tarball into the gitignored cache."""
    out = os.path.join(REFDATA_CACHE, name)
    if os.path.isdir(out):
        return out
    tar = os.path.join(REFERENCE_DIR, "data", f"{name}.tar.gz")
    if not os.path.exists(tar):
        pytest.skip(f"reference dataset {name} unavailable")
    import tarfile

    os.makedirs(REFDATA_CACHE, exist_ok=True)
    with tarfile.open(tar) as tf:
        tf.extractall(REFDATA_CACHE, filter="data")
    return out


@pytest.fixture(scope="session")
def mixed_dir() -> str:
    if not reference_available():
        pytest.skip("reference repo not mounted")
    return _ensure_extracted("mixed")


@pytest.fixture(scope="session")
def protein_dir() -> str:
    if not reference_available():
        pytest.skip("reference repo not mounted")
    return _ensure_extracted("protein")


@pytest.fixture(scope="session")
def pol_dir() -> str:
    if not reference_available():
        pytest.skip("reference repo not mounted")
    return _ensure_extracted("pol_data")


@pytest.fixture(scope="session")
def qm9_dir() -> str:
    if not reference_available():
        pytest.skip("reference repo not mounted")
    return _ensure_extracted("QM9")


@pytest.fixture(scope="session")
def curated_dir() -> str:
    if not reference_available():
        pytest.skip("reference repo not mounted")
    return _ensure_extracted("curated")


@pytest.fixture()
def rng() -> np.random.Generator:
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def toy_molecules():
    """Synthetic molecules (no reference needed) spanning sizes and charges."""
    from epnn_tpu.data.xyz import Molecule

    g = np.random.default_rng(7)
    mols = []
    specs = [
        (3, 0.0, ["O", "H", "H"]),
        (5, 1.0, ["N", "H", "H", "H", "H"]),
        (7, -1.0, ["C", "C", "O", "O", "H", "H", "H"]),
        (11, 2.0, ["C"] * 4 + ["N", "O"] + ["H"] * 5),
    ]
    for i, (n, q, symbols) in enumerate(specs):
        xyz = g.uniform(-2.5, 2.5, size=(n, 3)).astype(np.float32)
        labels = g.normal(0, 0.3, size=n).astype(np.float32)
        labels += (q - labels.sum()) / n
        mols.append(
            Molecule(name=f"toy{i}", symbols=symbols, xyz=xyz,
                     total_charge=q, labels=labels)
        )
    return mols
