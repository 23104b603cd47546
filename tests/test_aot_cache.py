"""Opt-in AOT program cache (pipeline/aot_cache.py).

The persistent XLA cache only skips backend compiles; NYXUS_TPU_AOT_CACHE
additionally persists the serialized jax.export program so a fresh process
skips the megakernel re-trace.  Pinned here: the artifact lands on disk
after a first run, and a fresh dispatch site serving from the artifact
(Exported.call path) produces the same features as the jit path.
"""

import glob
import os
import time

import numpy as np

from nyxus_tpu import taxonomy as tx
from nyxus_tpu.config import EngineConfig


def _slide(seed=5, hw=256):
    r = np.random.default_rng(seed)
    lab = np.zeros((hw, hw), np.int32)
    k = 1
    for y in range(8, hw - 28, 34):
        for x in range(8, hw - 28, 38):
            lab[y:y + int(r.integers(6, 26)), x:x + int(r.integers(6, 26))] = k
            k += 1
    inten = r.integers(1, 3000, lab.shape).astype(np.uint16)
    return inten, lab


def test_aot_artifact_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("NYXUS_TPU_AOT_CACHE", str(tmp_path))
    import nyxus_tpu.pipeline.runner as rmod

    inten, lab = _slide()
    fset = tx.parse_feature_request(["*ALL_INTENSITY*", "*ALL_GLCM*"])
    cfg = EngineConfig(precision="f32")

    monkeypatch.setattr(rmod, "_AOT_SLIDE", None)
    labs1, v1 = rmod.PairRunner(fset, cfg).run(inten, lab)

    # the background export thread serializes the program to the cache dir
    deadline = time.time() + 180
    while time.time() < deadline:
        blobs = glob.glob(str(tmp_path / "slide_fused-*.jaxexp"))
        if blobs:
            break
        time.sleep(0.25)
    assert blobs, "AOT artifact was not written"
    assert os.path.getsize(blobs[0]) > 1024

    # fresh-process simulation: a new dispatch site has no warmed jit, so
    # the first dispatch must serve from the deserialized artifact
    monkeypatch.setattr(rmod, "_AOT_SLIDE", None)
    labs2, v2 = rmod.PairRunner(fset, cfg).run(inten, lab)
    np.testing.assert_array_equal(labs1, labs2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6, atol=1e-9)

    site = rmod._AOT_SLIDE
    assert site is not None and site._exps, \
        "fresh site never deserialized the artifact"


def test_aot_disabled_is_inert(tmp_path, monkeypatch):
    monkeypatch.delenv("NYXUS_TPU_AOT_CACHE", raising=False)
    import nyxus_tpu.pipeline.runner as rmod
    monkeypatch.setattr(rmod, "_AOT_SLIDE", None)
    inten, lab = _slide(seed=6)
    fset = tx.parse_feature_request(["*ALL_INTENSITY*"])
    labs, v = rmod.PairRunner(fset, EngineConfig(precision="f32")).run(
        inten, lab)
    assert rmod._AOT_SLIDE is None
    assert len(labs) > 0 and np.isfinite(v[np.isfinite(v)]).all()
