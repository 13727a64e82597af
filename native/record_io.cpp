// Native record/event-log file I/O.
//
// C++ equivalents of the Manager's staging-buffer stream writers (reference
// src/mgr.cpp:481-505 record append, :418-471 event readback + the raw
// writeGameEvents struct dump, :104-117). The Python recorder packs numpy
// structured arrays; these entry points append/read the same
// byte-compatible formats with zero-copy fwrite/fread for high-rate eval
// runs.

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Opaque append-only writer.
typedef struct {
  FILE *f;
} MpenvWriter;

void *mpenv_writer_open(const char *path) {
  FILE *f = fopen(path, "wb");
  if (!f) return nullptr;
  MpenvWriter *w = new MpenvWriter{f};
  return (void *)w;
}

// Append raw records (StepLog / PackedStepSnapshot / GameEvent — any
// fixed-size struct stream). Returns records written.
int64_t mpenv_writer_append(void *handle, const void *data,
                            int64_t record_size, int64_t num_records) {
  if (!handle) return 0;
  MpenvWriter *w = (MpenvWriter *)handle;
  return (int64_t)fwrite(data, (size_t)record_size, (size_t)num_records,
                         w->f);
}

void mpenv_writer_close(void *handle) {
  if (!handle) return;
  MpenvWriter *w = (MpenvWriter *)handle;
  fclose(w->f);
  delete w;
}

// Read a slice of fixed-size records from a file into a caller buffer.
// Returns records read (0 on error / EOF).
int64_t mpenv_read_records(const char *path, int64_t record_size,
                           int64_t start_record, int64_t num_records,
                           void *out) {
  FILE *f = fopen(path, "rb");
  if (!f) return 0;
  if (fseek(f, (long)(start_record * record_size), SEEK_SET) != 0) {
    fclose(f);
    return 0;
  }
  int64_t n =
      (int64_t)fread(out, (size_t)record_size, (size_t)num_records, f);
  fclose(f);
  return n;
}

// Number of complete records in a file.
int64_t mpenv_count_records(const char *path, int64_t record_size) {
  FILE *f = fopen(path, "rb");
  if (!f) return 0;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fclose(f);
  return (int64_t)(size / record_size);
}

}  // extern "C"
