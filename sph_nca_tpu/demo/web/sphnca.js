/* SPH-NCA forward engine — standalone browser build.
 *
 * Third independent implementation of the forward math (after the JAX
 * engines and demo/engine.py's numpy backend), written from the math
 * spec in SURVEY.md §2a / the reference behavior contract
 * (nca.py:87-117 step composition, sph.py volume/gradient/blur).
 * Zero dependencies: no tf.js, no WebGL — flat typed arrays + CSR
 * neighbor structure built once per point set, so the per-step cost is
 * two CSR sweeps and one fired-subset MLP.
 *
 * Design notes (deliberately different from both the reference's tf.js
 * demo and our numpy backend):
 *   - neighbors live in one CSR block (ptr/idx/wv/gvx/gvy), built by
 *     counting-sort over periodic cells — no per-particle JS arrays;
 *   - the fire mask is sampled BEFORE the MLP and the MLP runs only on
 *     fired rows (non-fired rows keep their state exactly, so the
 *     result is bit-identical and ~1/fire_rate cheaper);
 *   - weights are transposed at load into [in][out] flat arrays so the
 *     inner GEMM loop is a contiguous axpy the JS JIT vectorizes.
 */

"use strict";

// ---------------------------------------------------------------------
// kernels (physics constants shared with ops/kernels.py — poly6/spiky,
// 2D normalizations; reference kernels_impl.py:21-29)
function poly6Norm2D(h) { return 4.0 / (Math.PI * Math.pow(h, 8)); }
function spikyNorm2D(h) { return 10.0 / (Math.PI * Math.pow(h, 5)); }

// smoothing-kernel table (config.smoothing selects; poly6 = reference
// default; Wendland C2/C4 match ops/kernels.py / kernels_impl.py:56-115)
const SMOOTHING_2D = {
  poly6: {
    norm: poly6Norm2D,
    w: (d2, h) => { const q = h * h - d2; return q > 0 ? q * q * q : 0; },
  },
  wendlandC2: {
    norm: (h) => 7.0 / (Math.PI * h * h),
    w: (d2, h) => {
      const q = Math.sqrt(d2) / h;
      if (q >= 1) return 0;
      const u = 1 - q;
      return u * u * u * u * (4 * q + 1);
    },
  },
  wendlandC4: {
    norm: (h) => 9.0 / (Math.PI * h * h),
    w: (d2, h) => {
      const q2 = d2 / (h * h), q = Math.sqrt(q2);
      if (q >= 1) return 0;
      const u = 1 - q, u2 = u * u, u3 = u2 * u;
      return u3 * u3 * (35 * q2 + 18 * q + 3) / 3;
    },
  },
};

// deterministic xorshift32 — the demo's fire-mask / init RNG
export function makeRng(seed) {
  let s = (seed >>> 0) || 0x9e3779b9;
  return function () {
    s ^= s << 13; s >>>= 0;
    s ^= s >>> 17;  // logical shift: true xorshift32 (>> would sign-fill)
    s ^= s << 5; s >>>= 0;
    return s / 4294967296;
  };
}

// ---------------------------------------------------------------------
// point patterns (behavior contract: reference utils.js point lattices —
// square / hexagonal with uniform or spatially-varying jitter)
export function makePoints(size, pattern, jitter, spatialJitter, rng) {
  const spacing = 2.0 / size;
  const pts = [];
  if (pattern === "hex") {
    const vs = spacing * Math.sqrt(3.0) / 2.0;
    const ny = Math.ceil(2.0 / vs);
    for (let j = 0; j < ny; j++) {
      const off = j % 2 ? spacing / 2.0 : 0.0;
      const nx = j % 2 ? size - 1 : size;
      const y = -1.0 + (j + 0.5) * vs;
      if (y < -1.0 || y > 1.0) continue;
      for (let i = 0; i < nx; i++) {
        pts.push(-1.0 + off + (i + 0.5) * spacing, y);
      }
    }
  } else {
    for (let i = 0; i < size; i++) {
      for (let j = 0; j < size; j++) {
        // x-major to match the server's meshgrid(indexing="ij")
        pts.push((i + 0.5) / size * 2.0 - 1.0,
                 (j + 0.5) / size * 2.0 - 1.0);
      }
    }
  }
  const x = new Float32Array(pts);
  if (jitter > 0) {
    for (let i = 0; i < x.length; i += 2) {
      let amp = jitter;
      if (spatialJitter) {
        // noise amplitude grows across the domain
        amp *= 0.5 * ((x[i] + 1.0) / 2.0 + (x[i + 1] + 1.0) / 2.0);
      }
      x[i] += (rng() * 2 - 1) * amp * spacing;
      x[i + 1] += (rng() * 2 - 1) * amp * spacing;
    }
  }
  return x;
}

// ---------------------------------------------------------------------
// CSR neighbor structure over a periodic modulo cell grid
function buildCSR(x, h, periodic) {
  const n = x.length >> 1;
  const dims = Math.ceil(2.0 / h);
  const nc = dims * dims;
  const h2 = h * h;

  // counting sort points into cells
  const cellOf = new Int32Array(n);
  const count = new Int32Array(nc + 1);
  for (let i = 0; i < n; i++) {
    let cx = Math.floor(x[2 * i] / h) % dims; if (cx < 0) cx += dims;
    let cy = Math.floor(x[2 * i + 1] / h) % dims; if (cy < 0) cy += dims;
    const c = cx * dims + cy;
    cellOf[i] = c;
    count[c + 1]++;
  }
  for (let c = 0; c < nc; c++) count[c + 1] += count[c];
  const bucket = new Int32Array(n);
  const cursor = count.slice(0, nc);
  for (let i = 0; i < n; i++) bucket[cursor[cellOf[i]]++] = i;

  // two passes: count neighbors, then fill
  const ptr = new Int32Array(n + 1);
  const per = periodic ? 2.0 : 0.0;
  const visit = (i, fn) => {
    const xi = x[2 * i], yi = x[2 * i + 1];
    let cx = Math.floor(xi / h), cy = Math.floor(yi / h);
    for (let ox = -1; ox <= 1; ox++) {
      for (let oy = -1; oy <= 1; oy++) {
        let gx = (cx + ox) % dims; if (gx < 0) gx += dims;
        let gy = (cy + oy) % dims; if (gy < 0) gy += dims;
        const c = gx * dims + gy;
        for (let k = count[c]; k < count[c + 1]; k++) {
          const j = bucket[k];
          let dx = x[2 * j] - xi, dy = x[2 * j + 1] - yi;
          if (per) {
            dx -= Math.round(dx / per) * per;
            dy -= Math.round(dy / per) * per;
          }
          const d2 = dx * dx + dy * dy;
          if (d2 < h2) fn(j, dx, dy, d2);
        }
      }
    }
  };
  for (let i = 0; i < n; i++) {
    let c = 0;
    visit(i, () => { c++; });
    ptr[i + 1] = ptr[i] + c;
  }
  const ne = ptr[n];
  const idx = new Int32Array(ne);
  const rx = new Float32Array(ne), ry = new Float32Array(ne);
  const d2s = new Float32Array(ne);
  for (let i = 0, e = 0; i < n; i++) {
    visit(i, (j, dx, dy, d2) => {
      idx[e] = j; rx[e] = dx; ry[e] = dy; d2s[e] = d2; e++;
    });
  }
  return { n, ptr, idx, rx, ry, d2: d2s };
}

// ---------------------------------------------------------------------
export class Engine {
  /**
   * @param {Float32Array} x  flat [n*2] positions in [-1,1]^2
   * @param {Object} weightsJson  the web-demo JSON weight format
   *   ({layers:[{index,weight,bias}], config:{...}}) — the interchange
   *   contract with the reference's export_weights.py
   * @param {Object} opts  {seed}
   */
  constructor(x, weightsJson, opts = {}) {
    const cfg = weightsJson.config;
    const layers = [...weightsJson.layers].sort((a, b) => a.index - b.index);
    this.h = cfg.h ?? 0.08;
    this.mode = cfg.mode ?? "image";
    this.useAlpha = this.mode === "image";
    this.fireRate = cfg.fire_rate ?? 0.5;
    this.updateRule = cfg.update_rule ?? "gated";
    this.C = Math.floor((cfg.input_features ?? 48) / 3);
    this.H = cfg.hidden_features ?? 256;
    this.OUT = cfg.output_features ?? (this.updateRule === "gated"
      ? 2 * this.C + 1 : this.C);
    this.x = x;
    this.n = x.length >> 1;
    this.rng = makeRng(opts.seed ?? 1);

    // transpose torch's [out][in] into flat [in][out] for axpy GEMMs
    const t = (w, nin, nout) => {
      const f = new Float32Array(nin * nout);
      for (let o = 0; o < nout; o++) {
        const row = w[o];
        for (let k = 0; k < nin; k++) f[k * nout + o] = row[k];
      }
      return f;
    };
    const IN = 3 * this.C;
    this.w1 = t(layers[0].weight, IN, this.H);
    this.b1 = Float32Array.from(layers[0].bias);
    this.w2 = t(layers[1].weight, this.H, this.OUT);
    this.b2 = Float32Array.from(layers[1].bias);

    // neighbor structure + baked pair weights (periodic wrap for
    // texture-mode models, like the trainer's --wrap)
    const g = buildCSR(x, this.h, !this.useAlpha);
    const smoothing = SMOOTHING_2D[cfg.smoothing ?? "poly6"];
    if (!smoothing) throw new Error(`unknown smoothing ${cfg.smoothing}`);
    const wfn = smoothing.w;
    const sw = smoothing.norm(this.h), sg = spikyNorm2D(this.h);
    const ne = g.idx.length;
    this.ptr = g.ptr; this.idx = g.idx;
    this.wv = new Float32Array(ne);
    this.gvx = new Float32Array(ne);
    this.gvy = new Float32Array(ne);

    // volume: v_i = 1 / (sigma_w * sum_j poly6(d^2))
    const v = new Float32Array(this.n);
    for (let i = 0; i < this.n; i++) {
      let s = 0;
      for (let e = g.ptr[i]; e < g.ptr[i + 1]; e++) {
        s += wfn(g.d2[e], this.h);
      }
      v[i] = 1.0 / (sw * s);
    }
    // edge weights: wv = sigma_w poly6 v_j ; gv = sigma_g spiky' r v_j
    for (let i = 0; i < this.n; i++) {
      for (let e = g.ptr[i]; e < g.ptr[i + 1]; e++) {
        const j = g.idx[e];
        this.wv[e] = sw * wfn(g.d2[e], this.h) * v[j];
        const d = Math.sqrt(g.d2[e]);
        if (d > 0 && d < this.h) {
          const mag = 3.0 * (this.h - d) * (this.h - d) / d;
          this.gvx[e] = sg * mag * g.rx[e] * v[j];
          this.gvy[e] = sg * mag * g.ry[e] * v[j];
        }
      }
    }

    // normalize_perception = 1/h (demo contract: perception scale
    // h * (1/h) = 1, discretization-agnostic rollouts)
    this.pscale = 1.0;

    // preallocated step buffers
    const C = this.C;
    this.A = new Float32Array(this.n * C);
    this._alive = new Uint8Array(this.n);
    this._alpha = new Float32Array(this.n);
    this._y = new Float32Array(IN);
    this._hid = new Float32Array(this.H);
    this._out = new Float32Array(this.OUT);
    this._nA = new Float32Array(this.n * C);
    this.stepCount = 0;
    this.reset();
  }

  reset() {
    const C = this.C;
    this.A.fill(0);
    if (this.mode === "image") {
      // radial alpha seed at the origin (demo contract: image-mode
      // models grow from a soft center seed)
      this.seedBrush(0, 0, this.h);
    } else {
      const r = makeRng(1234567);
      for (let k = 0; k < this.A.length; k++) this.A[k] = r();
    }
    this.stepCount = 0;
  }

  seedBrush(cx, cy, radius) {
    const C = this.C;
    for (let i = 0; i < this.n; i++) {
      const dx = this.x[2 * i] - cx, dy = this.x[2 * i + 1] - cy;
      const d2 = dx * dx + dy * dy;
      if (d2 < radius * radius) {
        let w = 1.0 - d2 / (radius * radius);
        w = w * w * w;
        for (let c = 0; c < C; c++) this.A[i * C + c] += w;
      }
    }
  }

  randomizeBrush(cx, cy, radius) {
    const C = this.C;
    for (let i = 0; i < this.n; i++) {
      const dx = this.x[2 * i] - cx, dy = this.x[2 * i + 1] - cy;
      if (dx * dx + dy * dy < radius * radius) {
        for (let c = 0; c < C; c++) this.A[i * C + c] = this.rng();
      }
    }
  }

  eraseBrush(cx, cy, radius) {
    const C = this.C;
    for (let i = 0; i < this.n; i++) {
      const dx = this.x[2 * i] - cx, dy = this.x[2 * i + 1] - cy;
      if (dx * dx + dy * dy < radius * radius) {
        for (let c = 0; c < C; c++) this.A[i * C + c] = 0;
      }
    }
  }

  // life mask: blur(alpha > 0.1) > 0.1 (reference nca.py life-mask
  // semantics; trivially all-alive for no-alpha texture models)
  _lifeMask(A, out) {
    if (!this.useAlpha) { out.fill(1); return; }
    const C = this.C, al = this._alpha;
    for (let i = 0; i < this.n; i++) al[i] = A[i * C + 3] > 0.1 ? 1.0 : 0.0;
    for (let i = 0; i < this.n; i++) {
      let s = 0;
      for (let e = this.ptr[i]; e < this.ptr[i + 1]; e++) {
        s += this.wv[e] * al[this.idx[e]];
      }
      out[i] = s > 0.1 ? 1 : 0;
    }
  }

  step() {
    const { n, C } = this;
    const IN = 3 * C, H = this.H, OUT = this.OUT;
    const A = this.A, nA = this._nA;
    const pre = this._alive;
    this._lifeMask(A, pre);

    const w1 = this.w1, b1 = this.b1, w2 = this.w2, b2 = this.b2;
    const y = this._y, hid = this._hid, out = this._out;
    const ptr = this.ptr, idx = this.idx;
    const wv = this.wv, gvx = this.gvx, gvy = this.gvy;

    for (let i = 0; i < n; i++) {
      const base = i * C;
      // fire-mask-first: non-fired rows keep A exactly — skip their MLP
      if (this.rng() > this.fireRate) {
        for (let c = 0; c < C; c++) nA[base + c] = A[base + c];
        continue;
      }
      // perception: y = [A, gA_x, gA_y] (pscale = h * (1/h) = 1)
      for (let c = 0; c < C; c++) {
        y[c] = A[base + c]; y[C + c] = 0; y[2 * C + c] = 0;
      }
      for (let e = ptr[i]; e < ptr[i + 1]; e++) {
        const jb = idx[e] * C;
        const gx = gvx[e] * this.pscale, gy = gvy[e] * this.pscale;
        if (gx === 0 && gy === 0) continue;
        for (let c = 0; c < C; c++) {
          const dA = A[jb + c] - A[base + c];
          y[C + c] += dA * gx;
          y[2 * C + c] += dA * gy;
        }
      }
      // MLP: relu(y W1 + b1) W2 + b2, contiguous axpy inner loops
      hid.set(b1);
      for (let k = 0; k < IN; k++) {
        const yk = y[k];
        if (yk === 0) continue;
        const row = k * H;
        for (let j = 0; j < H; j++) hid[j] += yk * w1[row + j];
      }
      out.set(b2);
      for (let k = 0; k < H; k++) {
        const hk = hid[k] > 0 ? hid[k] : 0;
        if (hk === 0) continue;
        const row = k * OUT;
        for (let j = 0; j < OUT; j++) out[j] += hk * w2[row + j];
      }
      if (this.updateRule === "gated") {
        const m = 1.0 / (1.0 + Math.exp(-out[OUT - 1]));
        for (let c = 0; c < C; c++) {
          const gate = 1.0 / (1.0 + Math.exp(-out[c]));
          nA[base + c] = A[base + c] * gate + Math.tanh(out[C + c]) * m;
        }
      } else {
        for (let c = 0; c < C; c++) nA[base + c] = A[base + c] + out[c];
      }
    }

    if (this.useAlpha) {
      const post = new Uint8Array(n);
      this._lifeMask(nA, post);
      for (let i = 0; i < n; i++) {
        const keep = pre[i] & post[i];
        const base = i * C;
        if (keep) { for (let c = 0; c < C; c++) A[base + c] = nA[base + c]; }
        else { for (let c = 0; c < C; c++) A[base + c] = 0; }
      }
    } else {
      A.set(nA);
    }
    this.stepCount++;
  }

  /** RGBA colors per particle, flat [n*4] floats in [0,1]. */
  colors(mode = "rgba") {
    const C = this.C, n = this.n;
    const out = new Float32Array(n * 4);
    for (let i = 0; i < n; i++) {
      const b = i * C;
      const act = this.useAlpha ? this.A[b + 3] : 1.0;
      if (mode === "activity") {
        const a = Math.min(1, Math.max(0, act));
        out[i * 4] = a; out[i * 4 + 1] = a; out[i * 4 + 2] = a;
        out[i * 4 + 3] = 1.0;
      } else {
        for (let c = 0; c < 3; c++) {
          out[i * 4 + c] = Math.min(1, Math.max(0, this.A[b + c]));
        }
        out[i * 4 + 3] = this.useAlpha
          ? Math.min(1, Math.max(0, act)) : 1.0;
      }
    }
    return out;
  }
}
