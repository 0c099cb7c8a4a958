"""Serving tests: sanitization, micro-batcher, HTTP server end-to-end with
stub engines."""

import base64
import io
import json
import threading
import time
import urllib.request

import numpy as np
from PIL import Image

from vstar_tpu.serve.batching import MicroBatcher
from vstar_tpu.serve.sanitize import sanitize_text
from vstar_tpu.serve.server import SealService, _make_handler


def test_sanitize_strips_tags_and_control():
    s = sanitize_text("<script>bad</script> where is\x00 the cat?\n\n\n\n!")
    assert "<script>" not in s and "\x00" not in s
    assert "where is the cat?" in s


def test_microbatcher_groups_by_key():
    calls = []

    def run_batch(key, items):
        calls.append((key, list(items)))
        return [x * 10 for x in items]

    mb = MicroBatcher(run_batch, max_batch=4, window_ms=50)
    futs = [mb.submit("a", i) for i in range(3)]
    assert [f.result(timeout=5) for f in futs] == [0, 10, 20]
    assert any(len(items) > 1 for _, items in calls)
    # different key never co-batches
    fa = mb.submit("a", 1)
    fb = mb.submit("b", 2)
    assert fa.result(timeout=5) == 10 and fb.result(timeout=5) == 20
    assert all(len({k for k, _ in [(k, i) for k, it in calls
                                   for i in it]}) >= 1 for _ in [0])
    mb.close()


class StubVQA:
    def free_form(self, image, question, **kw):
        if "focus" in question or "Additional visual" in question:
            return "it is red"
        return ("Sorry, I can not answer the question. Some visual "
                "information about the following objects is missing or "
                "unclear: tiny cup.")

    def multiple_choice(self, image, question, options, object_crops=None,
                        **kw):
        return 1

    def get_object_crop(self, image, bbox, patch_scale):
        return np.zeros((28, 28, 3), np.float32)


class StubVSM:
    def detect(self, patch, name):
        boxes = np.zeros((4, 4), np.float32)
        boxes[0] = [0.5, 0.5, 0.25, 0.25]
        return boxes, np.asarray([0.9, 0, 0, 0], np.float32), \
            np.ones((patch.height, patch.width), np.float32)

    def vqa(self, patch, q):
        return "most likely to appear on the table."

    def segment(self, patch, phrase):
        return np.ones((patch.height, patch.width), np.float32)


def _b64_image():
    img = Image.fromarray(np.zeros((64, 96, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_seal_service_freeform_flow():
    svc = SealService(StubVQA(), StubVSM(), minimum_size=224)
    img = Image.fromarray(np.zeros((80, 120, 3), np.uint8))
    rec = svc.answer(img, "what color is the tiny cup?")
    assert rec["missing_objects"] == ["tiny cup"]
    assert len(rec["search_result"]) == 1
    assert rec["answer"] == "it is red"
    assert rec["latency_s"] >= 0


def test_http_server_roundtrip():
    from http.server import ThreadingHTTPServer
    svc = SealService(StubVQA(), StubVSM())
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(svc))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # health
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            assert json.loads(r.read())["ok"]
        # answer with options -> SEAL multiple-choice path
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/answer",
            data=json.dumps({"image": _b64_image(),
                             "question": "what color?",
                             "options": ["red", "blue"]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            rec = json.loads(r.read())
        assert rec["option_chosen"] == 1
        assert rec["missing_objects"] == ["tiny cup"]
        # malformed request -> 400 json error
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/answer", data=b"notjson",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_warmup_compiles_all_buckets():
    """warmup_* must run every (mode x bucket) program without error on
    tiny engines (compilation coverage; serve.server --warmup)."""
    import jax
    import jax.numpy as jnp
    from vstar_tpu.core.config import vsm_tiny, vqa_llm_tiny
    from vstar_tpu.eval.vqa_engine import VQAEngine, warmup_vqa_engine
    from vstar_tpu.models.vqa_llm import init_vqa_llm_params
    from vstar_tpu.models.vsm import init_vsm_params
    from vstar_tpu.search.batched import (BatchedVSMEngine,
                                          warmup_vsm_engine)
    from tests.test_data import WordTokenizer

    tok = WordTokenizer()
    vsm = BatchedVSMEngine(
        init_vsm_params(jax.random.PRNGKey(0), vsm_tiny()), vsm_tiny(),
        tok, loc_token_id=tok._word_id("[LOC]"), max_new_tokens=4,
        prompt_buckets=(64, 128), compute_dtype=jnp.float32,
        device_preprocess=True)
    warmup_vsm_engine(vsm, canvas_sizes=((64, 64), (96, 64)),
                      batch_buckets=(1, 2), log=None)

    vqa = VQAEngine(init_vqa_llm_params(jax.random.PRNGKey(1),
                                        vqa_llm_tiny()), vqa_llm_tiny(),
                    tok, prompt_buckets=(128,), option_bucket=16,
                    compute_dtype=jnp.float32, speculative_template="")
    warmup_vqa_engine(vqa, image_size=28, batch_buckets=(1,),
                      max_new_tokens=4, log=None)


def test_demo_four_outputs(tmp_path):
    """serve/demo.py surfaces the reference demo's exact four outputs
    (app.py:235-255): direct/trigger text, search outcome text, bbox
    visualization, focused final answer — and the no-search case returns
    (answer, None, None, None) like app.py:156."""
    from vstar_tpu.serve.demo import demo_outputs, load_examples

    svc = SealService(StubVQA(), StubVSM(), minimum_size=224)
    img = Image.fromarray(np.zeros((80, 120, 3), np.uint8))
    direct, outcome, vis, final = demo_outputs(
        svc, img, "what color is the tiny cup?")
    assert direct == ("Need to conduct visual search to search for: "
                      "tiny cup.")
    assert outcome == "Targets located after search: tiny cup."
    assert vis.size == img.size and vis is not img
    assert final == "it is red"

    class DirectVQA(StubVQA):
        def free_form(self, image, question, **kw):
            return "a plain answer"

    direct, outcome, vis, final = demo_outputs(
        SealService(DirectVQA(), StubVSM()), img, "what is this?")
    assert direct == "a plain answer"
    assert outcome is None and vis is None and final is None

    # examples gallery: manifest form and bare-images form
    import json
    (tmp_path / "a.jpg").write_bytes(b"")
    json.dump([["what is on the flag?", "a.jpg"]],
              open(tmp_path / "examples.json", "w"))
    ex = load_examples(str(tmp_path))
    assert ex == [["what is on the flag?", str(tmp_path / "a.jpg")]]
    (tmp_path / "examples.json").unlink()
    ex = load_examples(str(tmp_path))
    assert ex and ex[0][1].endswith("a.jpg")
    assert load_examples(None) is None


def test_demo_server_flag_parity():
    """The demo CLI reaches every engine residency/optimization mode the
    server has (add_engine_flags is the single source): --mixed, --int4,
    --compiled, --warmup, --mesh, --kv-int8, --prompt-lookup,
    --compile-cache all parse identically on both parsers."""
    import argparse
    from vstar_tpu.serve.server import add_engine_flags

    sp, dp = argparse.ArgumentParser(), argparse.ArgumentParser()
    add_engine_flags(sp)
    add_engine_flags(dp)
    argv = ["--mixed", "--int4", "--int4mix", "--compiled", "--warmup",
            "--kv-int8", "--prompt-lookup", "--mesh", "1x4x1",
            "--device-preprocess", "--compile-cache", "/tmp/cc",
            "--vqa-model-path", "p1", "--vsm-model-path", "p2"]
    s, d = sp.parse_args(argv), dp.parse_args(argv)
    assert vars(s) == vars(d)
    assert s.mixed and s.int4 and s.int4mix and s.compiled and s.warmup
    assert s.kv_int8 and s.prompt_lookup and s.device_preprocess
    assert s.mesh == "1x4x1" and s.compile_cache == "/tmp/cc"
    # bare invocation: every opt-in defaults off, int8 stays tri-state
    bare = sp.parse_args([])
    assert not (bare.mixed or bare.int4 or bare.int4mix
                or bare.compiled or bare.warmup)
    assert bare.int8 is None


def test_random_init_tiny_serving_stack():
    """--random-init runs the FULL serving stack checkpoint-free: real
    tiny models with random weights + the stub tokenizer, through the
    continuous service with a forced search — trigger decode, compiled
    guided search, focused answer all execute end to end."""
    import argparse

    from vstar_tpu.serve.continuous import ContinuousSealService
    from vstar_tpu.serve.server import add_engine_flags, engines_from_flags

    p = argparse.ArgumentParser()
    add_engine_flags(p)
    args = p.parse_args(["--random-init", "tiny", "--compiled"])
    vqa, vsm = engines_from_flags(args)
    svc = ContinuousSealService(vqa, vsm, max_batch=2, window_ms=20.0,
                                max_search_steps=2,
                                missing_parser=lambda pred: ["cat"])
    try:
        img = Image.fromarray(np.random.RandomState(0).randint(
            0, 255, (64, 96, 3), np.uint8))
        rec = svc.answer(img, "what color is the cat?", ["red", "blue"])
    finally:
        svc.close()
    assert "error" not in rec
    assert rec["missing_objects"] == ["cat"]
    # options were supplied -> the MC record schema
    assert isinstance(rec["prediction_freeform"], str)
    assert rec["option_chosen"] in (0, 1)
    # the search ran: it either located the target or recorded the miss
    assert "search_result" in rec
