#!/usr/bin/env python
"""Live web viewer: the interactive frontend over the engine facade.

The reference's user surface is the Trident-Forge editor (live viewport +
ImGuizmo transforms, ApplicationLayer.cpp:38-227, SceneViewportPanel.cpp:
63-100). The TPU rebuild is headless-first, so the interactive surface is
a localhost web page streaming `present()` frames with:

  * orbit / pan / dolly editor camera (drag / shift-drag / wheel)
  * click-to-select (tri_id → entity picking) + inspector editing
  * play/stop, primitive spawning, scene save/load
  * FPS overlay from the engine timing ring

Run:  python scripts/viewer.py [--width 512 --height 512 --port 8642]
            [--model path.obj ...] [--scene file.trident] [--shadows]
Then open http://localhost:8642/ .

All engine access serializes through one lock (the renderer is a
single-threaded object, like the reference's render thread).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PAGE = """<!DOCTYPE html>
<html><head><title>trident_tpu viewer</title><style>
 body { margin:0; background:#14151a; color:#cfd2dc; font:13px monospace;
        display:flex; height:100vh; }
 #view { flex:1; display:flex; align-items:center; justify-content:center; }
 #frame { image-rendering:pixelated; cursor:grab; max-width:100%;
          max-height:100%; }
 #side { width:300px; padding:10px; overflow-y:auto; background:#1b1d24;
         border-left:1px solid #2a2d38; }
 button { background:#2a2d38; color:#cfd2dc; border:1px solid #3a3e4c;
          margin:2px; padding:4px 10px; cursor:pointer; }
 button.on { background:#3d6b4f; }
 .ent { padding:2px 6px; cursor:pointer; }
 .ent.sel { background:#31405c; }
 input { background:#14151a; color:#cfd2dc; border:1px solid #3a3e4c;
         width:56px; margin:1px; }
 h4 { margin:8px 0 4px; color:#8e93a5; }
 #stats { color:#7dc87d; }
</style></head><body>
<div id=view><img id=frame></div>
<div id=side>
  <div id=stats>--</div>
  <div>
    <button id=play onclick="act('play')">Play</button>
    <button onclick="act('stop')">Stop</button>
  </div>
  <div>
    <button onclick="spawn('cube')">+Cube</button>
    <button onclick="spawn('sphere')">+Sphere</button>
    <button onclick="spawn('quad')">+Quad</button>
  </div>
  <h4>Entities</h4><div id=ents></div>
  <h4>Inspector</h4><div id=insp>click an entity in the viewport</div>
</div>
<script>
const img = document.getElementById('frame');
let sel = null, dragging = 0, lx = 0, ly = 0, moved = 0;
async function post(u, b) {
  const r = await fetch(u, {method:'POST', body: JSON.stringify(b||{})});
  return r.json();
}
async function act(a) { await post('/api/' + a); refreshState(); }
async function spawn(p) { await post('/api/spawn', {primitive: p}); refreshEnts(); }
async function loop() {
  try {
    const r = await fetch('/api/frame?t=' + Date.now());
    const b = await r.blob();
    const url = URL.createObjectURL(b);
    img.onload = () => URL.revokeObjectURL(url);
    img.src = url;
  } catch (e) {}
  requestAnimationFrame(loop);
}
img.onpointerdown = e => { dragging = e.buttons; lx = e.clientX; ly = e.clientY;
                           moved = 0; img.setPointerCapture(e.pointerId); };
img.onpointerup = async e => {
  if (!moved) {
    const r = img.getBoundingClientRect();
    const x = Math.floor((e.clientX - r.left) / r.width  * img.naturalWidth);
    const y = Math.floor((e.clientY - r.top)  / r.height * img.naturalHeight);
    const res = await post('/api/pick', {x: x, y: y});
    select(res.entity);
  }
  dragging = 0;
};
img.onpointermove = e => {
  if (!dragging) return;
  const dx = e.clientX - lx, dy = e.clientY - ly; lx = e.clientX; ly = e.clientY;
  moved += Math.abs(dx) + Math.abs(dy);
  if (e.shiftKey || dragging === 4) post('/api/camera', {op:'pan', dx:dx, dy:dy});
  else post('/api/camera', {op:'orbit', dx:dx, dy:dy});
};
img.onwheel = e => { e.preventDefault();
                     post('/api/camera', {op:'dolly', dy:e.deltaY}); };
img.oncontextmenu = e => e.preventDefault();
async function refreshEnts() {
  const r = await (await fetch('/api/entities')).json();
  const d = document.getElementById('ents');
  d.innerHTML = '';
  for (const e of r.entities) {
    const el = document.createElement('div');
    el.className = 'ent' + (e.id === sel ? ' sel' : '');
    el.textContent = '#' + e.id + ' ' + e.tag;
    el.onclick = () => select(e.id);
    d.appendChild(el);
  }
}
async function select(id) {
  sel = id; refreshEnts();
  const d = document.getElementById('insp');
  if (id === null || id === undefined) { d.textContent = 'nothing selected'; return; }
  const r = await (await fetch('/api/entity?id=' + id)).json();
  d.innerHTML = '';
  for (const [comp, fields] of Object.entries(r.components)) {
    const h = document.createElement('h4'); h.textContent = comp; d.appendChild(h);
    for (const [f, v] of Object.entries(fields)) {
      const row = document.createElement('div');
      row.textContent = f + ' ';
      if (Array.isArray(v)) {
        v.forEach((x, i) => {
          const inp = document.createElement('input');
          inp.value = (typeof x === 'number') ? +x.toFixed(4) : x;
          inp.onchange = async () => {
            const cur = (await (await fetch('/api/entity?id='+id)).json())
                        .components[comp][f];
            cur[i] = parseFloat(inp.value);
            post('/api/set', {entity:id, component:comp, field:f, value:cur});
          };
          row.appendChild(inp);
        });
      } else {
        const inp = document.createElement('input');
        inp.style.width = '120px';
        inp.value = v;
        inp.onchange = () => post('/api/set',
          {entity:id, component:comp, field:f,
           value: isNaN(parseFloat(inp.value)) ? inp.value
                : (Number.isInteger(v) && Number.isInteger(+inp.value)
                   ? parseInt(inp.value) : parseFloat(inp.value))});
        row.appendChild(inp);
      }
      d.appendChild(row);
    }
  }
}
async function refreshState() {
  const r = await (await fetch('/api/state')).json();
  document.getElementById('stats').textContent =
    r.fps.toFixed(1) + ' fps  ' + r.width + 'x' + r.height +
    (r.playing ? '  [playing]' : '');
  document.getElementById('play').className = r.playing ? 'on' : '';
}
loop(); refreshEnts(); setInterval(refreshState, 1000);
</script></body></html>"""


class ViewerServer:
    """HTTP wrapper around an Application: one lock serializes all engine
    access (renderer state is single-threaded by design)."""

    def __init__(self, app, host: str = "127.0.0.1", port: int = 8642):
        self.app = app
        self.lock = threading.Lock()
        self._frames = 0
        self._fps = 0.0
        self._fps_t0 = time.perf_counter()
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, obj, code=200):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = self.path.split("?")[0]
                try:
                    if path == "/":
                        body = _PAGE.encode()
                        self.send_response(200)
                        self.send_header("Content-Type", "text/html")
                        self.send_header("Content-Length", str(len(body)))
                        self.end_headers()
                        self.wfile.write(body)
                    elif path == "/api/frame":
                        png = viewer.frame_png()
                        self.send_response(200)
                        self.send_header("Content-Type", "image/png")
                        self.send_header("Content-Length", str(len(png)))
                        self.end_headers()
                        self.wfile.write(png)
                    elif path == "/api/entities":
                        self._json(viewer.entities())
                    elif path == "/api/entity":
                        q = self.path.split("?", 1)[1] if "?" in self.path else ""
                        eid = int(dict(p.split("=") for p in q.split("&"))["id"])
                        self._json(viewer.entity(eid))
                    elif path == "/api/state":
                        self._json(viewer.state())
                    else:
                        self._json({"error": "not found"}, 404)
                except Exception as exc:  # surface errors to the page
                    self._json({"error": str(exc)}, 500)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                path = self.path.split("?")[0]
                try:
                    out = viewer.command(path.removeprefix("/api/"), body)
                    self._json(out if out is not None else {"ok": True})
                except Exception as exc:
                    self._json({"error": str(exc)}, 500)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]

    # -- engine ops (all under the lock) ---------------------------------------
    def frame_png(self) -> bytes:
        from PIL import Image

        with self.lock:
            self.app.update()
            frame = self.app.renderer.present()
            self._frames += 1
            now = time.perf_counter()
            if now - self._fps_t0 >= 1.0:
                self._fps = self._frames / (now - self._fps_t0)
                self._frames = 0
                self._fps_t0 = now
        buf = io.BytesIO()
        Image.fromarray(np.asarray(frame)).save(buf, format="PNG")
        return buf.getvalue()

    def entities(self):
        from trident_tpu.ecs.components import TagComponent

        with self.lock:
            reg = self.app.renderer.registry
            out = []
            for e in reg.alive():
                tag = reg.try_get(e, TagComponent)
                out.append({"id": int(e), "tag": tag.tag if tag else ""})
        return {"entities": out}

    def entity(self, eid: int):
        from trident_tpu.ecs.inspect import list_entity

        with self.lock:
            return {"id": eid,
                    "components": list_entity(self.app.renderer.registry, eid)}

    def state(self):
        with self.lock:
            r = self.app.renderer
            ctx = r.viewports[r.active_viewport]
            return {"fps": self._fps, "width": ctx.width, "height": ctx.height,
                    "playing": bool(self.app.scene.playing),
                    "models": r.stats_models, "triangles": r.stats_triangles}

    def command(self, op: str, body: dict):
        from trident_tpu.ecs.inspect import set_field

        with self.lock:
            app, r = self.app, self.app.renderer
            cam = r.editor_camera
            if op == "camera":
                kind = body.get("op")
                dx, dy = float(body.get("dx", 0)), float(body.get("dy", 0))
                if kind == "orbit":
                    lt = getattr(cam, "_look_target", None)
                    pivot = lt[0] if lt else np.zeros(3, np.float32)
                    cam.orbit(pivot, -dx * 0.4, -dy * 0.4)
                elif kind == "pan":
                    cam.pan(-dx * 0.01, dy * 0.01)
                elif kind == "dolly":
                    cam.dolly(-dy * 0.002)
            elif op == "pick":
                ent = r.pick_entity(int(body["x"]), int(body["y"]))
                return {"entity": ent}
            elif op == "play":
                app.scene.play()
                r.set_active_registry(app.scene.runtime_registry)
            elif op == "stop":
                app.scene.stop()
                r.set_active_registry(app.scene.editor_registry)
            elif op == "spawn":
                from trident_tpu.ecs.components import (
                    MeshComponent, TagComponent, TransformComponent)
                from trident_tpu.geometry.primitives import PrimitiveType

                prim = {"cube": PrimitiveType.CUBE,
                        "sphere": PrimitiveType.SPHERE,
                        "quad": PrimitiveType.QUAD}[body["primitive"]]
                reg = r.registry
                e = reg.create()
                reg.add(e, TransformComponent())
                reg.add(e, TagComponent(tag=body["primitive"]))
                reg.add(e, MeshComponent(mesh_index=r.ensure_primitive(prim)))
                return {"entity": int(e)}
            elif op == "set":
                set_field(r.registry, int(body["entity"]), body["component"],
                          body["field"], body["value"])
            elif op == "save":
                app.scene.save(body["path"])
            elif op == "load":
                app.scene.load(body["path"])
                r.set_active_registry(app.scene.editor_registry)
            else:
                raise ValueError(f"unknown command {op}")
        return None

    def serve_forever(self):
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def build_app(args):
    from trident_tpu.app import Application
    from trident_tpu.core.config import EngineConfig, RenderConfig
    from trident_tpu.ecs.components import (
        LightComponent, LightType, MeshComponent, TagComponent,
        TextureComponent, TransformComponent)
    from trident_tpu.geometry.primitives import PrimitiveType
    from trident_tpu.io.image import checkerboard

    cfg = EngineConfig(render=RenderConfig(
        width=args.width, height=args.height, shadows=args.shadows))
    app = Application(cfg)
    reg = app.scene.editor_registry
    if args.scene:
        app.scene.load(args.scene)
        app.renderer.set_active_registry(app.scene.editor_registry)
    if args.model:
        app.import_assets(args.model)
    if not args.scene and not args.model:
        slot = app.renderer.acquire_texture("checker", checkerboard(128, 8))
        for name, pos, prim in (("cube", [-1.1, 0, 0], PrimitiveType.CUBE),
                                ("sphere", [1.1, 0, 0], PrimitiveType.SPHERE)):
            e = reg.create()
            t = reg.add(e, TransformComponent())
            t.position = np.asarray(pos, np.float32)
            reg.add(e, TagComponent(tag=name))
            reg.add(e, MeshComponent(
                mesh_index=app.renderer.ensure_primitive(prim)))
            reg.add(e, TextureComponent(path="checker", slot=slot))
        sun = reg.create()
        reg.add(sun, TransformComponent())
        lc = reg.add(sun, LightComponent(light_type=LightType.DIRECTIONAL))
        lc.direction = np.asarray([-0.4, -1.0, -0.35], np.float32)
        reg.add(sun, TagComponent(tag="sun"))
    app.renderer.editor_camera.set_position([0, 1.2, 4.5])
    app.renderer.editor_camera.look_at_target([0, 0, 0])
    return app


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--height", type=int, default=512)
    parser.add_argument("--port", type=int, default=8642)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--model", action="append", default=[])
    parser.add_argument("--scene", default=None)
    parser.add_argument("--shadows", action="store_true")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (the env var alone does "
                             "not defeat a pinned TPU plugin platform)")
    args = parser.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    app = build_app(args)
    server = ViewerServer(app, args.host, args.port)
    print(f"viewer: http://{args.host}:{server.port}/  (ctrl-c to stop)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        app.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
