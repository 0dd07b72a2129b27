/* _fastpack — native batch packer for the evaluation host path.
 *
 * Packs N tokenized samples (variable-length int32 id arrays + prompt
 * lengths) into the fixed-length padded arrays the device consumes:
 * input_ids, attention mask, roll(-1) label ids and supervised-span
 * masks — the data/xym.py batch_samples() inner loop as one C pass.
 *
 * The reference framework has no native runtime at all (SURVEY.md §2:
 * 100% Python); in this framework host-side batch prep sits between
 * every pair of device dispatches on the evaluation hot loop, so it is
 * implemented natively with a pure-NumPy fallback (native/__init__.py).
 *
 * Build: `make -C devqa_tpu/native` (auto-invoked on first import).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

/* pack(ids_buffer, lengths, prompt_lens, pad_id, L)
 *   ids_buffer: bytes containing all samples' int32 ids concatenated
 *   lengths:    bytes of int32 per-sample lengths (N entries)
 *   prompt_lens: bytes of int32 per-sample prompt lengths
 *   pad_id:     int
 *   L:          padded row length
 * returns: bytes of 4 stacked int32 arrays [4, N, L]
 *   (input_ids, attn_mask, label_ids, label_masks)
 */
static PyObject *pack(PyObject *self, PyObject *args) {
    Py_buffer ids_buf, len_buf, plen_buf;
    int pad_id;
    Py_ssize_t L;
    if (!PyArg_ParseTuple(args, "y*y*y*in", &ids_buf, &len_buf, &plen_buf,
                          &pad_id, &L))
        return NULL;

    const int32_t *ids = (const int32_t *)ids_buf.buf;
    const int32_t *lens = (const int32_t *)len_buf.buf;
    const int32_t *plens = (const int32_t *)plen_buf.buf;
    Py_ssize_t N = len_buf.len / (Py_ssize_t)sizeof(int32_t);

    /* Validate the caller-supplied invariants before touching memory:
     * plens must have N entries, every lens[b] must fit in [0, L], and
     * sum(lens) must equal the ids buffer's element count — otherwise
     * memcpy below would read/write out of bounds. */
    if (plen_buf.len != len_buf.len) {
        PyBuffer_Release(&ids_buf);
        PyBuffer_Release(&len_buf);
        PyBuffer_Release(&plen_buf);
        PyErr_SetString(PyExc_ValueError,
                        "prompt_lens and lengths must have equal size");
        return NULL;
    }
    {
        Py_ssize_t total = 0;
        for (Py_ssize_t b = 0; b < N; b++) {
            if (lens[b] < 0 || (Py_ssize_t)lens[b] > L) {
                PyBuffer_Release(&ids_buf);
                PyBuffer_Release(&len_buf);
                PyBuffer_Release(&plen_buf);
                PyErr_Format(PyExc_ValueError,
                             "lens[%zd]=%d outside [0, L=%zd]", b,
                             (int)lens[b], L);
                return NULL;
            }
            total += lens[b];
        }
        if (total * (Py_ssize_t)sizeof(int32_t) != ids_buf.len) {
            PyBuffer_Release(&ids_buf);
            PyBuffer_Release(&len_buf);
            PyBuffer_Release(&plen_buf);
            PyErr_SetString(PyExc_ValueError,
                            "sum(lens) inconsistent with ids buffer size");
            return NULL;
        }
    }

    PyObject *out = PyBytes_FromStringAndSize(NULL, 4 * N * L * sizeof(int32_t));
    if (!out) {
        PyBuffer_Release(&ids_buf);
        PyBuffer_Release(&len_buf);
        PyBuffer_Release(&plen_buf);
        return NULL;
    }
    int32_t *o = (int32_t *)PyBytes_AS_STRING(out);
    int32_t *input_ids = o;
    int32_t *attn = o + N * L;
    int32_t *labels = o + 2 * N * L;
    int32_t *masks = o + 3 * N * L;

    Py_ssize_t off = 0;
    for (Py_ssize_t b = 0; b < N; b++) {
        int32_t n = lens[b];
        int32_t pl = plens[b];
        const int32_t *row = ids + off;
        int32_t *ii = input_ids + b * L;
        int32_t *am = attn + b * L;
        int32_t *li = labels + b * L;
        int32_t *lm = masks + b * L;
        for (Py_ssize_t j = 0; j < L; j++) {
            ii[j] = pad_id;
            am[j] = 0;
            li[j] = pad_id;
            lm[j] = 0;
        }
        memcpy(ii, row, n * sizeof(int32_t));
        for (int32_t j = 0; j < n; j++) am[j] = 1;
        /* labels = roll(ids, -1): label[j] = ids[j+1]; label[n-1] = ids[0] */
        for (int32_t j = 0; j + 1 < n; j++) li[j] = row[j + 1];
        if (n > 0) li[n - 1] = row[0];
        /* supervised span [prompt_len-1, n-1) */
        for (int32_t j = pl - 1; j < n - 1; j++)
            if (j >= 0) lm[j] = 1;
        off += n;
    }

    PyBuffer_Release(&ids_buf);
    PyBuffer_Release(&len_buf);
    PyBuffer_Release(&plen_buf);
    return out;
}

static PyMethodDef methods[] = {
    {"pack", pack, METH_VARARGS,
     "pack concatenated int32 samples into padded id/mask/label arrays"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastpack", NULL, -1, methods};

PyMODINIT_FUNC PyInit__fastpack(void) { return PyModule_Create(&moduledef); }
