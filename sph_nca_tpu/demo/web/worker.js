/* Simulation worker for the standalone SPH-NCA demo.
 *
 * Owns the Engine and runs the step loop off the UI thread; the main
 * thread only renders. Protocol (behavior mirror of the reference's
 * worker-driven demo, independently structured):
 *   main -> worker: {type:'init', weights, size, pattern, jitter,
 *                    spatialJitter, seed}
 *                   {type:'play'} {type:'pause'} {type:'reset'}
 *                   {type:'brush', x, y, radius, kind}
 *   worker -> main: {type:'ready', n, positions}   (after init)
 *                   {type:'frame', step, colors, stepMs}
 * Colors ride as transferable Float32Array buffers.
 */

"use strict";

import { Engine, makePoints, makeRng } from "./sphnca.js";

const SPHNCA = { Engine, makePoints, makeRng };

let engine = null;
let playing = false;
let timer = null;

function postFrame(stepMs) {
  const colors = engine.colors("rgba");
  postMessage(
    { type: "frame", step: engine.stepCount, colors, stepMs },
    [colors.buffer]
  );
}

function loop() {
  if (!playing || !engine) return;
  const t0 = performance.now();
  engine.step();
  postFrame(performance.now() - t0);
  timer = setTimeout(loop, 0);
}

onmessage = (ev) => {
  const m = ev.data;
  switch (m.type) {
    case "init": {
      playing = false;
      if (timer) clearTimeout(timer);
      const rng = SPHNCA.makeRng(m.seed ?? 42);
      const x = SPHNCA.makePoints(
        m.size, m.pattern, m.jitter, m.spatialJitter, rng
      );
      engine = new SPHNCA.Engine(x, m.weights, { seed: m.seed ?? 1 });
      const positions = new Float32Array(x);
      postMessage(
        { type: "ready", n: engine.n, mode: engine.mode, positions },
        [positions.buffer]
      );
      postFrame(0);
      playing = true;
      loop();
      break;
    }
    case "play":
      if (!playing) { playing = true; loop(); }
      break;
    case "pause":
      playing = false;
      if (timer) clearTimeout(timer);
      break;
    case "reset":
      if (engine) { engine.reset(); postFrame(0); }
      break;
    case "brush":
      if (!engine) break;
      if (m.kind === "randomize") {
        engine.randomizeBrush(m.x, m.y, m.radius);
      } else if (m.kind === "erase") {
        engine.eraseBrush(m.x, m.y, m.radius);
      } else {
        engine.seedBrush(m.x, m.y, m.radius);
      }
      if (!playing) postFrame(0);
      break;
  }
};
