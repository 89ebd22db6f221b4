// Win32 stub for building the reference's main.cpp (main.cpp:3,54) on
// Linux.  Only CreateDirectory is used.
#pragma once

#include <sys/stat.h>
#include <sys/types.h>

typedef void* LPSECURITY_ATTRIBUTES;

static inline int CreateDirectory(const char* path, LPSECURITY_ATTRIBUTES) {
    return mkdir(path, 0755) == 0;
}
