// Thin Linux driver around the UNMODIFIED reference core.
//
// Links optical_flow.cpp / patch_grid.cpp / patch.cpp / IO_flow.cpp
// compiled AS-IS from /root/reference/src (see Makefile) and drives
// them with the reference's own pyramid recipe (the same OpenCV call
// sequence as construct_pyramide, main.cpp:12-50) and post-processing
// (main.cpp:140-155, 191-198).  The flow is dumped raw with the
// reference's own SaveFlowFile (IO_flow.cpp:57-98) so EPE can be
// scored head-to-head against dis_tpu, the NumPy oracle, and the
// independent C++ baseline on identical float32 inputs.
//
// Protocol (same as tools/cpp_baseline/dis_baseline, plus .flo output):
//   ref_probe W H iters ps coarsest finest overlap norm in1.f32 in2.f32 out.flo
// stderr gets one JSON line with wall-clock timings (pyramid, solve).
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include <opencv2/opencv.hpp>
#include <optical_flow.hpp>
#include <IO_flow.hpp>

namespace {

bool read_raw_f32(const char* path, int w, int h, cv::Mat& out) {
    out.create(h, w, CV_32FC1);
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    size_t want = static_cast<size_t>(w) * h;
    size_t got = std::fread(out.ptr<float>(), sizeof(float), want, f);
    std::fclose(f);
    return got == want;
}

struct Pyramid {
    std::vector<cv::Mat> im, dx, dy;     // padded per-level planes (owned)
    std::vector<float*> pim, pdx, pdy;   // raw pointers handed to the core
};

// Reference pyramid recipe (construct_pyramide, main.cpp:12-50):
// gradient-magnitude base (quirk Q1), 0.5x INTER_LINEAR chain computed
// BEFORE padding, per-level 3x3 Sobel (scale 1/8, reflect-101), then
// replicate-padded image / zero-padded gradients by `padding`.
Pyramid build_pyramid(const cv::Mat& img, int levels, int padding) {
    Pyramid p;
    int n = levels + 1;
    p.im.resize(n); p.dx.resize(n); p.dy.resize(n);
    p.pim.resize(n); p.pdx.resize(n); p.pdy.resize(n);
    for (int i = 0; i < n; ++i) {
        if (i == 0) {
            cv::Mat gx, gy, mag;
            cv::Sobel(img, gx, CV_32F, 1, 0, 3, 1 / 8.0, 0,
                      cv::BORDER_DEFAULT);
            cv::Sobel(img, gy, CV_32F, 0, 1, 3, 1 / 8.0, 0,
                      cv::BORDER_DEFAULT);
            mag = gx.mul(gx) + gy.mul(gy);
            cv::sqrt(mag, mag);
            p.im[0] = mag;
        } else {
            cv::resize(p.im[i - 1], p.im[i], cv::Size(), .5, .5,
                       cv::INTER_LINEAR);
        }
        cv::Sobel(p.im[i], p.dx[i], CV_32F, 1, 0, 3, 1 / 8.0, 0,
                  cv::BORDER_DEFAULT);
        cv::Sobel(p.im[i], p.dy[i], CV_32F, 0, 1, 3, 1 / 8.0, 0,
                  cv::BORDER_DEFAULT);
    }
    for (int i = 0; i < n; ++i) {
        cv::copyMakeBorder(p.im[i], p.im[i], padding, padding, padding,
                           padding, cv::BORDER_REPLICATE);
        cv::copyMakeBorder(p.dx[i], p.dx[i], padding, padding, padding,
                           padding, cv::BORDER_CONSTANT, 0);
        cv::copyMakeBorder(p.dy[i], p.dy[i], padding, padding, padding,
                           padding, cv::BORDER_CONSTANT, 0);
        p.pim[i] = reinterpret_cast<float*>(p.im[i].data);
        p.pdx[i] = reinterpret_cast<float*>(p.dx[i].data);
        p.pdy[i] = reinterpret_cast<float*>(p.dy[i].data);
    }
    return p;
}

double now_s() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

}  // namespace

int main(int argc, char** argv) {
    if (argc != 12) {
        std::fprintf(stderr,
                     "usage: %s W H iters ps coarsest finest overlap norm "
                     "in1.f32 in2.f32 out.flo\n",
                     argv[0]);
        return 2;
    }
    int w = std::atoi(argv[1]), h = std::atoi(argv[2]);
    int iters = std::atoi(argv[3]), ps = std::atoi(argv[4]);
    int coarsest = std::atoi(argv[5]), finest = std::atoi(argv[6]);
    float overlap = static_cast<float>(std::atof(argv[7]));
    bool norm = std::atoi(argv[8]) != 0;

    cv::Mat i1, i2;
    if (!read_raw_f32(argv[9], w, h, i1) ||
        !read_raw_f32(argv[10], w, h, i2)) {
        std::fprintf(stderr, "cannot read raw f32 inputs\n");
        return 1;
    }

    // Divisibility padding: replicate border, floor/ceil side split
    // (main.cpp:140-155).
    int div = 1 << coarsest;
    int padw = (w % div) ? div - (w % div) : 0;
    int padh = (h % div) ? div - (h % div) : 0;
    if (padw || padh) {
        cv::copyMakeBorder(i1, i1, padh / 2, padh - padh / 2, padw / 2,
                           padw - padw / 2, cv::BORDER_REPLICATE);
        cv::copyMakeBorder(i2, i2, padh / 2, padh - padh / 2, padw / 2,
                           padw - padw / 2, cv::BORDER_REPLICATE);
    }
    int pw = w + padw, ph = h + padh;

    double t0 = now_s();
    Pyramid p1 = build_pyramid(i1, coarsest, ps);
    Pyramid p2 = build_pyramid(i2, coarsest, ps);
    double t1 = now_s();

    int sc = 1 << finest;
    cv::Mat flow(ph / sc, pw / sc, CV_32FC2);
    OpticalFlow::OpticalFlowClass ofc(
        p1.pim.data(), p1.pdx.data(), p1.pdy.data(), p2.pim.data(),
        p2.pdx.data(), p2.pdy.data(), ps,
        reinterpret_cast<float*>(flow.data), pw, ph, coarsest, finest, iters,
        ps, overlap, norm, false);
    double t2 = now_s();

    // Output post-processing (main.cpp:191-198).
    if (finest != 0) {
        flow *= static_cast<float>(sc);
        cv::resize(flow, flow, cv::Size(), sc, sc, cv::INTER_LINEAR);
    }
    flow = flow(cv::Rect(padw / 2, padh / 2, w, h)).clone();
    SaveFlowFile(flow, argv[11]);

    std::fprintf(stderr,
                 "{\"pyramid_s\": %.4f, \"solve_s\": %.4f, \"total_s\": "
                 "%.4f}\n",
                 t1 - t0, t2 - t1, t2 - t0);
    return 0;
}
