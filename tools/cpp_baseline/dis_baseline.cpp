// dis_baseline — single-threaded CPU implementation of the compat-mode
// DIS pipeline, written from scratch against the executable spec in
// dis_tpu/oracle/reference_semantics.py (same semantics the reference
// C++ exhibits; see SURVEY.md §2 quirk ledger).
//
// Purpose: (a) the frames/s denominator for bench.py — the reference
// repo publishes no numbers and is Windows-only, so we measure our own
// equivalent-work baseline on this machine (BASELINE.md); (b) an
// independent cross-check of the NumPy oracle on larger inputs.
//
// Usage:
//   dis_baseline W H iters ps coarsest finest overlap norm reps \
//                [in1.f32 in2.f32 [out_flow.f32]]
// Inputs are raw float32 row-major W*H files; without them a smooth
// synthetic pair is generated. Prints one JSON line with timing.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <string>
#include <vector>

namespace {

struct Plane {
  int w = 0, h = 0;
  std::vector<float> d;
  Plane() = default;
  Plane(int w_, int h_) : w(w_), h(h_), d((size_t)w_ * h_, 0.f) {}
  float& at(int y, int x) { return d[(size_t)y * w + x]; }
  float at(int y, int x) const { return d[(size_t)y * w + x]; }
};

inline int reflect101(int i, int n) {
  if (i < 0) i = -i;
  if (i >= n) i = 2 * n - 2 - i;
  return i;
}

Plane sobel3(const Plane& im, bool dx) {
  Plane out(im.w, im.h);
  for (int y = 0; y < im.h; ++y) {
    for (int x = 0; x < im.w; ++x) {
      float acc = 0.f;
      for (int j = -1; j <= 1; ++j) {
        int yy = reflect101(y + j, im.h);
        for (int i = -1; i <= 1; ++i) {
          int xx = reflect101(x + i, im.w);
          float k;
          if (dx)
            k = (float)i * (j == 0 ? 2.f : 1.f);
          else
            k = (float)j * (i == 0 ? 2.f : 1.f);
          acc += k * im.at(yy, xx);
        }
      }
      out.at(y, x) = acc * 0.125f;
    }
  }
  return out;
}

Plane magnitude(const Plane& gx, const Plane& gy) {
  Plane out(gx.w, gx.h);
  for (size_t i = 0; i < out.d.size(); ++i)
    out.d[i] = std::sqrt(gx.d[i] * gx.d[i] + gy.d[i] * gy.d[i]);
  return out;
}

Plane half(const Plane& im) {
  Plane out(im.w / 2, im.h / 2);
  for (int y = 0; y < out.h; ++y)
    for (int x = 0; x < out.w; ++x)
      out.at(y, x) = 0.25f * (im.at(2 * y, 2 * x) + im.at(2 * y, 2 * x + 1) +
                              im.at(2 * y + 1, 2 * x) + im.at(2 * y + 1, 2 * x + 1));
  return out;
}

Plane pad(const Plane& im, int p, bool replicate) {
  Plane out(im.w + 2 * p, im.h + 2 * p);
  for (int y = 0; y < out.h; ++y) {
    for (int x = 0; x < out.w; ++x) {
      int sy = y - p, sx = x - p;
      if (replicate) {
        sy = sy < 0 ? 0 : (sy >= im.h ? im.h - 1 : sy);
        sx = sx < 0 ? 0 : (sx >= im.w ? im.w - 1 : sx);
        out.at(y, x) = im.at(sy, sx);
      } else {
        out.at(y, x) = (sy < 0 || sy >= im.h || sx < 0 || sx >= im.w)
                           ? 0.f : im.at(sy, sx);
      }
    }
  }
  return out;
}

struct Level { Plane img, dx, dy; int w, h; };

std::vector<Level> pyramid(const Plane& in, int coarsest, int padpx) {
  std::vector<Level> lv(coarsest + 1);
  Plane cur;
  for (int s = 0; s <= coarsest; ++s) {
    if (s == 0) {
      Plane gx = sobel3(in, true), gy = sobel3(in, false);
      cur = magnitude(gx, gy);
    } else {
      cur = half(cur);
    }
    Plane gx = sobel3(cur, true), gy = sobel3(cur, false);
    lv[s].w = cur.w; lv[s].h = cur.h;
    lv[s].img = pad(cur, padpx, true);
    lv[s].dx = pad(gx, padpx, false);
    lv[s].dy = pad(gy, padpx, false);
  }
  return lv;
}

struct Params {
  int iters, ps, coarsest, finest;
  float overlap; bool norm;
  int steps() const {
    int s = (int)std::floor((float)ps * (1.f - overlap));
    return s < 1 ? 1 : s;
  }
};

// One scale of the patch search + densification.
void run_scale(const Level& L1, const Level& L2, const Params& P, int padpx,
               const std::vector<float>* flow_prev, int prev_w,
               std::vector<float>* flow_out) {
  const int w = L1.w, h = L1.h, ps = P.ps, half_ps = ps / 2;
  const int steps = P.steps();
  const int npw = (w + steps - 1) / steps;
  const int nph = (h + steps - 1) / steps;
  const int offw = (w - (npw - 1) * steps) / 2;
  const int offh = (h - (nph - 1) * steps) / 2;
  const int tw = w + 2 * padpx;
  const float lb = -(float)ps / 2.f;
  const float ubw = (float)(w + half_ps - 2);
  const float ubh = (float)(h + half_ps - 2);
  const float thresh = (float)ps / 2.f;
  const int n2 = ps * ps;

  std::vector<float> T(n2), Tdx(n2), Tdy(n2), Q(n2);
  std::vector<float> u_all((size_t)npw * nph * 2, 0.f);

  auto sample = [&](float px, float py) {
    float l = std::floor(px), k = std::floor(py);
    float a = px - l, b = py - k;
    float w0 = (1 - a) * (1 - b), w1 = a * (1 - b), w2 = b * (1 - a), w3 = a * b;
    int cx = (int)std::ceil(px + 1e-5f) + padpx;
    int cy = (int)std::ceil(py + 1e-5f) + padpx;
    int di = 0;
    float mean = 0.f;
    for (int j = -half_ps; j < half_ps; ++j) {
      const float* rowa = &L2.img.d[(size_t)(cy + j) * tw];
      const float* rowc = &L2.img.d[(size_t)(cy + j - 1) * tw];
      for (int i = -half_ps; i < half_ps; ++i, ++di) {
        int xa = cx + i;
        float v = w3 * rowa[xa] + w2 * rowa[xa - 1] + w1 * rowc[xa] + w0 * rowc[xa - 1];
        Q[di] = v;
        mean += v;
      }
    }
    if (P.norm) {
      mean /= (float)n2;
      for (int i = 0; i < n2; ++i) Q[i] -= mean;
    }
  };

  int pid = 0;
  for (int ix = 0; ix < npw; ++ix) {
    for (int iy = 0; iy < nph; ++iy, ++pid) {
      const int cx = ix * steps + offw;
      const int cy = iy * steps + offh;
      // template + Hessian
      int di = 0;
      float haa = 0.f, hab = 0.f, hbb = 0.f;
      for (int j = -half_ps; j < half_ps; ++j) {
        for (int i = -half_ps; i < half_ps; ++i, ++di) {
          size_t idx = (size_t)(cy + j + padpx) * tw + (cx + i + padpx);
          T[di] = L1.img.d[idx];
          Tdx[di] = L1.dx.d[idx];
          Tdy[di] = L1.dy.d[idx];
          haa += Tdx[di] * Tdx[di];
          hab += Tdx[di] * Tdy[di];
          hbb += Tdy[di] * Tdy[di];
        }
      }
      if (haa * hbb - hab * hab == 0.f) { haa += 1e-10f; hbb += 1e-10f; }
      const float det = haa * hbb - hab * hab;
      const float iaa = hbb / det, iab = -hab / det, ibb = haa / det;

      // init from coarser flow (NN lookup, x2)
      float iux = 0.f, iuy = 0.f;
      if (flow_prev) {
        int qx = cx / 2, qy = cy / 2;
        size_t qi = ((size_t)qy * prev_w + qx) * 2;
        iux = (*flow_prev)[qi] * 2.f;
        iuy = (*flow_prev)[qi + 1] * 2.f;
      }

      float ux = iux, uy = iuy;
      float px = cx + ux, py = cy + uy;
      const float sx = px, sy = py;
      bool conv = false;
      if (px < lb || py < lb || px > ubw || py > ubh) {
        conv = true;  // OOB start: freeze with u = init
      } else {
        sample(px, py);
        for (int it = 1; it <= P.iters + 1 && !conv; ++it) {
          float r0 = 0.f, r1 = 0.f;
          for (int i = 0; i < n2; ++i) { r0 += Tdx[i] * Q[i]; r1 += Tdy[i] * Q[i]; }
          const float dx = iaa * r0 + iab * r1;
          const float dy = iab * r0 + ibb * r1;
          ux -= dx; uy -= dy;
          px = cx + ux; py = cy + uy;
          const float mx = sx - px, my = sy - py;
          if (std::sqrt(mx * mx + my * my) > thresh ||
              px < lb || py < lb || px > ubw || py > ubh) {
            ux = iux; uy = iuy;
            px = cx + ux; py = cy + uy;
            conv = true;
          }
          sample(px, py);
          if (it > P.iters) conv = true;
        }
      }
      u_all[(size_t)pid * 2] = ux;
      u_all[(size_t)pid * 2 + 1] = uy;
    }
  }

  // densification: scatter-add, uniform weight, zeroed accumulators
  flow_out->assign((size_t)w * h * 2, 0.f);
  std::vector<float> wsum((size_t)w * h, 0.f);
  pid = 0;
  for (int ix = 0; ix < npw; ++ix) {
    for (int iy = 0; iy < nph; ++iy, ++pid) {
      const int cx = ix * steps + offw, cy = iy * steps + offh;
      const float ux = u_all[(size_t)pid * 2], uy = u_all[(size_t)pid * 2 + 1];
      for (int j = -half_ps; j < half_ps; ++j) {
        const int yt = cy + j;
        if (yt < 0 || yt >= h) continue;
        for (int i = -half_ps; i < half_ps; ++i) {
          const int xt = cx + i;
          if (xt < 0 || xt >= w) continue;
          const size_t pi = (size_t)yt * w + xt;
          (*flow_out)[pi * 2] += 0.5f * ux;
          (*flow_out)[pi * 2 + 1] += 0.5f * uy;
          wsum[pi] += 0.5f;
        }
      }
    }
  }
  for (size_t i = 0; i < wsum.size(); ++i) {
    if (wsum[i] > 0.f) {
      (*flow_out)[i * 2] /= wsum[i];
      (*flow_out)[i * 2 + 1] /= wsum[i];
    }
  }
}

std::vector<float> dis_flow(const Plane& i1, const Plane& i2, const Params& P) {
  auto p1 = pyramid(i1, P.coarsest, P.ps);
  auto p2 = pyramid(i2, P.coarsest, P.ps);
  std::vector<float> prev, cur;
  int prev_w = 0;
  for (int s = P.coarsest; s >= P.finest; --s) {
    run_scale(p1[s], p2[s], P, P.ps, s == P.coarsest ? nullptr : &prev,
              prev_w, &cur);
    prev = cur;
    prev_w = p1[s].w;
  }
  return cur;
}

Plane synth(int w, int h, uint32_t seed) {
  // xorshift noise, then two 7x7 box blurs (same spirit as test fixtures)
  Plane p(w, h);
  uint32_t st = seed * 2654435761u + 1u;
  for (auto& v : p.d) {
    st ^= st << 13; st ^= st >> 17; st ^= st << 5;
    v = (float)(st & 0xffffff) / (float)0xffffff * 255.f;
  }
  for (int pass = 0; pass < 2; ++pass) {
    Plane q(w, h);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        float acc = 0.f; int cnt = 0;
        for (int j = -3; j <= 3; ++j)
          for (int i = -3; i <= 3; ++i) {
            int yy = y + j, xx = x + i;
            if (yy >= 0 && yy < h && xx >= 0 && xx < w) { acc += p.at(yy, xx); ++cnt; }
          }
        q.at(y, x) = acc / (float)cnt;
      }
    p = q;
  }
  return p;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 10) {
    std::fprintf(stderr,
        "usage: %s W H iters ps coarsest finest overlap norm reps "
        "[in1.f32 in2.f32 [out.f32]]\n", argv[0]);
    return 2;
  }
  const int W = atoi(argv[1]), H = atoi(argv[2]);
  Params P;
  P.iters = atoi(argv[3]); P.ps = atoi(argv[4]);
  P.coarsest = atoi(argv[5]); P.finest = atoi(argv[6]);
  P.overlap = (float)atof(argv[7]); P.norm = atoi(argv[8]) != 0;
  const int reps = atoi(argv[9]);

  const int f = 1 << P.coarsest;
  if (W % f || H % f) {
    std::fprintf(stderr, "W,H must be divisible by 2^coarsest=%d\n", f);
    return 2;
  }

  Plane i1, i2;
  if (argc >= 12) {
    i1 = Plane(W, H); i2 = Plane(W, H);
    FILE* a = fopen(argv[10], "rb");
    FILE* b = fopen(argv[11], "rb");
    if (!a || !b) { std::fprintf(stderr, "cannot open inputs\n"); return 2; }
    if (fread(i1.d.data(), 4, i1.d.size(), a) != i1.d.size() ||
        fread(i2.d.data(), 4, i2.d.size(), b) != i2.d.size()) {
      std::fprintf(stderr, "short read\n"); return 2;
    }
    fclose(a); fclose(b);
  } else {
    i1 = synth(W, H, 1);
    i2 = synth(W, H, 2);
  }

  std::vector<float> flow;
  auto t0 = std::chrono::steady_clock::now();
  for (int r = 0; r < reps; ++r) flow = dis_flow(i1, i2, P);
  auto t1 = std::chrono::steady_clock::now();
  const double sec =
      std::chrono::duration<double>(t1 - t0).count() / (double)reps;

  if (argc >= 13) {
    FILE* o = fopen(argv[12], "wb");
    fwrite(flow.data(), 4, flow.size(), o);
    fclose(o);
  }
  std::printf("{\"seconds_per_frame\": %.6f, \"fps\": %.4f}\n", sec,
              1.0 / sec);
  return 0;
}
