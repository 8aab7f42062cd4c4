#pragma once
/* No-op OpenMP shim: the reference is compiled WITHOUT -fopenmp here, so
 * all `#pragma omp` directives are ignored (sequential execution) and only
 * these runtime queries need definitions. */
static inline int omp_get_thread_num(void) { return 0; }
static inline int omp_get_num_threads(void) { return 1; }
static inline int omp_get_max_threads(void) { return 1; }
static inline void omp_set_num_threads(int) {}
static inline double omp_get_wtime(void) { return 0.0; }
