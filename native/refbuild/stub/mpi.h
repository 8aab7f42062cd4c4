#pragma once
/* Minimal no-op MPI shim so the REFERENCE's sequential path
 * (/root/reference/main.c + utils.c) compiles without an MPI install.
 * Only the symbols reachable from utils.c need to exist (utils.h:1 includes
 * <mpi.h> unconditionally); none of the MPI entry points are ever executed
 * on the sequential path, so every call is a no-op returning MPI_SUCCESS.
 */
typedef int MPI_Comm;
typedef int MPI_Datatype;
typedef int MPI_Op;
typedef int MPI_Group;
typedef struct {
    int MPI_SOURCE;
    int MPI_TAG;
    int MPI_ERROR;
} MPI_Status;

#define MPI_SUCCESS 0
#define MPI_COMM_WORLD ((MPI_Comm)0)
#define MPI_INT ((MPI_Datatype)1)
#define MPI_LONG_DOUBLE ((MPI_Datatype)2)
#define MPI_DOUBLE ((MPI_Datatype)3)
#define MPI_SUM ((MPI_Op)0)
#define MPI_STATUS_IGNORE ((MPI_Status *)0)

static inline int MPI_Init(int *, char ***) { return MPI_SUCCESS; }
static inline int MPI_Finalize(void) { return MPI_SUCCESS; }
static inline int MPI_Comm_size(MPI_Comm, int *n) { *n = 1; return MPI_SUCCESS; }
static inline int MPI_Comm_rank(MPI_Comm, int *r) { *r = 0; return MPI_SUCCESS; }
static inline int MPI_Send(const void *, int, MPI_Datatype, int, int, MPI_Comm) {
    return MPI_SUCCESS;
}
static inline int MPI_Recv(void *, int, MPI_Datatype, int, int, MPI_Comm,
                           MPI_Status *) {
    return MPI_SUCCESS;
}
static inline int MPI_Bcast(void *, int, MPI_Datatype, int, MPI_Comm) {
    return MPI_SUCCESS;
}
static inline int MPI_Reduce(const void *, void *, int, MPI_Datatype, MPI_Op,
                             int, MPI_Comm) {
    return MPI_SUCCESS;
}
static inline int MPI_Barrier(MPI_Comm) { return MPI_SUCCESS; }
