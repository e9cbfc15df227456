// Compatibility shim to build the UNMODIFIED reference (/root/reference)
// against OpenCV 4.x, which removed the legacy CV_LOAD_IMAGE_* constants
// (run_dense.cpp:200-204 uses them).  Force-included via g++ -include.
#pragma once
#include <opencv2/imgcodecs.hpp>
#ifndef CV_LOAD_IMAGE_GRAYSCALE
#define CV_LOAD_IMAGE_GRAYSCALE cv::IMREAD_GRAYSCALE
#endif
#ifndef CV_LOAD_IMAGE_COLOR
#define CV_LOAD_IMAGE_COLOR cv::IMREAD_COLOR
#endif
