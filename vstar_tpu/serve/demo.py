"""Interactive SEAL demo — counterpart of the reference app.py.

With gradio installed: the same interface (image + question -> direct
answer, search trigger, bbox visualization, focused re-answer). Without
gradio (this environment): a terminal REPL over the identical SealService
flow, writing bbox visualizations to disk.
"""

from __future__ import annotations

import argparse
import os

from PIL import Image

from ..search.visualize import draw_bbox
from .server import SealService


def run_cli(service: SealService, out_dir: str = "./demo_out"):
    os.makedirs(out_dir, exist_ok=True)
    print("SEAL demo — enter '<image_path> :: <question>' (empty to quit)")
    i = 0
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line:
            break
        if "::" not in line:
            print("format: <image_path> :: <question>")
            continue
        path, question = [s.strip() for s in line.split("::", 1)]
        try:
            image = Image.open(path).convert("RGB")
        except Exception as e:
            print(f"cannot open image: {e}")
            continue
        rec = service.answer(image, question)
        print("direct:", rec.get("freeform"))
        if rec.get("missing_objects"):
            print("missing objects:", rec["missing_objects"])
            vis = image
            for r in rec["search_result"]:
                vis = draw_bbox(vis, r["bbox"], r["name"])
            out = os.path.join(out_dir, f"search_{i}.jpg")
            vis.save(out)
            print("search result boxes ->", out)
            print("focused answer:", rec.get("answer"))
        print(f"({rec['latency_s']:.2f}s)")
        i += 1


def launch_gradio(service: SealService):  # pragma: no cover - needs gradio
    import gradio as gr

    def infer(image, question):
        rec = service.answer(image, question)
        vis = image
        for r in rec.get("search_result", []):
            vis = draw_bbox(vis, r["bbox"], r["name"])
        return rec.get("answer") or rec.get("freeform"), vis

    demo = gr.Interface(
        fn=infer,
        inputs=[gr.Image(type="pil"), gr.Textbox(label="question")],
        outputs=[gr.Textbox(label="answer"),
                 gr.Image(label="search result")],
        title="V*: Guided Visual Search (TPU)",
    )
    demo.queue().launch()


def main():
    p = argparse.ArgumentParser("seal demo")
    p.add_argument("--vqa-model-path", default="craigwu/seal_vqa_7b")
    p.add_argument("--vsm-model-path", default="craigwu/seal_vsm_7b")
    args = p.parse_args()
    from ..eval.vstar_bench import load_engines
    vqa, vsm = load_engines(args.vqa_model_path, args.vsm_model_path)
    service = SealService(vqa, vsm)
    try:
        import gradio  # noqa: F401
        launch_gradio(service)
    except ImportError:
        run_cli(service)


if __name__ == "__main__":
    main()
