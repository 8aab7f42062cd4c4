#pragma once
/* Single-process LOOPBACK MPI: enough of the MPI-1 API to execute the
 * reference's distributed estimators (/root/reference/main_mpi.c:168-1013
 * + utils.c:273-437 inverse_mpi) for real, with every simulated rank
 * running as a std::thread inside one process and Send/Recv/Bcast/
 * Reduce/Barrier implemented over buffered in-memory queues
 * (mpi_loopback.cpp).  This exists to CAPTURE the MPI variants' actual
 * outputs as parity goldens (VERDICT round-4 missing#2) — the no-op shim
 * in ../stub/mpi.h can only anchor the sequential path.
 *
 * Semantics notes (vs a real MPI):
 *   - MPI_Send is buffered (never blocks).  Message matching is exact
 *     (communicator, source, dest, tag) FIFO, so any schedule that
 *     terminates yields the same values a conforming MPI run yields.
 *   - Communicators/groups are content-addressed by their world-rank
 *     lists; MPI_Comm_create returns the same handle to every caller
 *     (members use it, non-members — per the reference's own usage —
 *     never touch theirs).
 *   - Exactly the symbols the reference uses are provided (grep over
 *     main_mpi.c/utils.c/utils.h), nothing more.
 */

typedef int MPI_Comm;
typedef int MPI_Group;
typedef int MPI_Datatype;
typedef int MPI_Op;
typedef struct {
    int MPI_SOURCE;
    int MPI_TAG;
    int MPI_ERROR;
} MPI_Status;

#define MPI_SUCCESS 0
#define MPI_COMM_WORLD ((MPI_Comm)0)
#define MPI_COMM_NULL ((MPI_Comm)-1)
#define MPI_MAX_PROCESSOR_NAME 256
#define MPI_INT ((MPI_Datatype)1)
#define MPI_LONG_DOUBLE ((MPI_Datatype)2)
#define MPI_DOUBLE ((MPI_Datatype)3)
#define MPI_SUM ((MPI_Op)0)
#define MPI_STATUS_IGNORE ((MPI_Status *)0)

int MPI_Init(int *argc, char ***argv);
int MPI_Finalize(void);
int MPI_Comm_size(MPI_Comm comm, int *size);
int MPI_Comm_rank(MPI_Comm comm, int *rank);
int MPI_Get_processor_name(char *name, int *len);
int MPI_Barrier(MPI_Comm comm);
int MPI_Send(const void *buf, int count, MPI_Datatype dt, int dest, int tag,
             MPI_Comm comm);
int MPI_Recv(void *buf, int count, MPI_Datatype dt, int source, int tag,
             MPI_Comm comm, MPI_Status *status);
int MPI_Bcast(void *buf, int count, MPI_Datatype dt, int root, MPI_Comm comm);
int MPI_Reduce(const void *sendbuf, void *recvbuf, int count, MPI_Datatype dt,
               MPI_Op op, int root, MPI_Comm comm);
int MPI_Comm_group(MPI_Comm comm, MPI_Group *group);
int MPI_Group_incl(MPI_Group group, int n, const int *ranks,
                   MPI_Group *newgroup);
int MPI_Comm_create(MPI_Comm comm, MPI_Group group, MPI_Comm *newcomm);
int MPI_Group_free(MPI_Group *group);
int MPI_Comm_free(MPI_Comm *comm);

/* driver-side controls (not MPI API) */
void mpiloop_init(int world_size);
void mpiloop_bind_thread(int world_rank);
void mpiloop_reset(void);
