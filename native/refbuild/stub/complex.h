#pragma once
/* Shadow GCC's C++ <complex.h> wrapper (which #undefs the `complex` macro)
 * with glibc's C99 complex header, so the reference's `long double complex`
 * spelling compiles as GNU C++ `_Complex long double` — the same type the
 * original mpiCC build used. */
#include "/usr/include/complex.h"
#ifndef complex
#define complex _Complex
#endif
