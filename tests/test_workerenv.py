"""Unit tests for sparkcrawl/workerenv/sitecustomize.py — the Python-worker
startup shim that makes per-task importlib.invalidate_caches() cheap by
guarding zipimporter directory re-reads with an (mtime_ns, size) check.

No Spark session needed: the shim is plain Python. The test imports it the
way a worker would (module exec with SPARK_REUSE_WORKER set), then drives
zipimport.zipimporter.invalidate_caches directly.
"""

import importlib.util
import os
import zipfile
import zipimport

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM = os.path.join(REPO, "sparkcrawl", "workerenv", "sitecustomize.py")


def _load_shim(monkeypatch):
    monkeypatch.setenv("SPARK_REUSE_WORKER", "1")
    spec = importlib.util.spec_from_file_location(
        "_sparkcrawl_workerenv_shim_test", SHIM
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_guard_skips_unchanged_zip_and_reacts_to_change(
    tmp_path, monkeypatch
):
    orig = zipimport.zipimporter.invalidate_caches
    try:
        mod = _load_shim(monkeypatch)
        assert zipimport.zipimporter.invalidate_caches is not orig

        zpath = str(tmp_path / "lib.zip")
        with zipfile.ZipFile(zpath, "w") as z:
            z.writestr("pkg/__init__.py", "x = 1\n")
        zi = zipimport.zipimporter(zpath)

        calls = []
        monkeypatch.setattr(mod, "_orig_invalidate",
                            lambda self: calls.append(1))

        zi.invalidate_caches()
        zi.invalidate_caches()
        zi.invalidate_caches()
        assert len(calls) == 1  # unchanged archive -> one real read

        # a genuinely replaced archive (new size) must still invalidate
        with zipfile.ZipFile(zpath, "w") as z:
            z.writestr("pkg/__init__.py", "x = 2  # different size\n")
        zi.invalidate_caches()
        assert len(calls) == 2
        zi.invalidate_caches()
        assert len(calls) == 2  # and is then cached again
    finally:
        zipimport.zipimporter.invalidate_caches = orig


def test_shim_inert_without_worker_env(monkeypatch):
    orig = zipimport.zipimporter.invalidate_caches
    monkeypatch.delenv("SPARK_REUSE_WORKER", raising=False)
    spec = importlib.util.spec_from_file_location(
        "_sparkcrawl_workerenv_shim_inert", SHIM
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert zipimport.zipimporter.invalidate_caches is orig


def test_shim_ships_next_to_session():
    """session.get_spark injects sparkcrawl/workerenv onto PYTHONPATH; the
    shim file must exist there (the injection itself is exercised by every
    Spark-session test via conftest)."""
    import sparkcrawl.session as sess

    workerenv = os.path.join(os.path.dirname(os.path.abspath(sess.__file__)),
                             "workerenv")
    assert os.path.isfile(os.path.join(workerenv, "sitecustomize.py"))
