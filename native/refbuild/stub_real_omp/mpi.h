#pragma once
/* Forward to the no-op MPI shim while letting the REAL <omp.h> resolve
 * from the system (this dir deliberately has no omp.h): the OpenMP
 * capture build compiles the reference with -fopenmp so its
 * thread-id-indexed estimators (main_openmp.c:82-176 use
 * omp_get_thread_num() AS the subcarrier index) execute for real. */
#include "../stub/mpi.h"
