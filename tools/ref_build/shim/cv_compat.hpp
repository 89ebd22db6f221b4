// Force-included (-include) into every reference TU: OpenCV 2.4-era
// constants for OpenCV 4.6, and headless no-ops for the HighGUI display
// calls (main.cpp:203-204, optical_flow.cpp:120-122) — this environment
// has no display; the file outputs are what parity needs.
#pragma once

#include <cmath>
#include <cstdlib>
#include <cstring>

#include <opencv2/opencv.hpp>
#include <opencv2/imgcodecs/legacy/constants_c.h>  // CV_LOAD_IMAGE_GRAYSCALE
#include <opencv2/imgproc/types_c.h>               // CV_GRAY2RGB

static inline void dis_shim_ignore_window() {}
static inline int dis_shim_ignore_key() { return -1; }

// Argument lists are dropped at preprocessing time (never evaluated);
// all reference call sites are unqualified statements.
#define imshow(...) dis_shim_ignore_window()
#define namedWindow(...) dis_shim_ignore_window()
#define waitKey(...) dis_shim_ignore_key()
