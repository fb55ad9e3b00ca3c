/* Minimal single-header glib shim for compiling the reference SIEVE-BS /
 * SIEVE-BS-Mp parity binaries when the real glib-2.0 is not installed
 * (tests/ref_compile.py adds -I csrc/glibshim as a fallback).
 *
 * Implements exactly the surface those two programs use
 * (/root/reference/Base_line/C implementations/SIEVE-BS.c,
 *  SIEVE-BS-Mp.c): GHashTable (new_full/insert/lookup/contains/remove/
 * size/destroy/iter), GQueue, GArray, g_direct_hash/equal, g_malloc/
 * g_new/g_free.  This is an original implementation of the (public,
 * documented) glib API, not glib code.
 *
 * Semantics notes:
 * - GHashTable iteration follows INSERTION ORDER (entries array + hash
 *   index, tombstoned deletes) — the closest analog to the Python dicts
 *   the C was transliterated from; real glib iterates in bucket order.
 *   On tie-free fixtures (the only ones the parity tests use) every
 *   order yields identical output.
 * - sizeof(GQueue)/sizeof(GList) match real glib's 3-field layouts, so
 *   the programs' analytic `memory:` accounting is unchanged.
 * - g_hash_table_insert destroys the old value on replacement, like
 *   glib.
 */
#ifndef FV_GLIB_SHIM_H
#define FV_GLIB_SHIM_H

#include <limits.h> /* real glib.h exposes this transitively; programs rely on it */
#include <stdlib.h>
#include <string.h>

typedef void *gpointer;
typedef const void *gconstpointer;
typedef int gboolean;
typedef int gint;
typedef unsigned int guint;
typedef size_t gsize;
typedef char gchar;

#ifndef TRUE
#define TRUE 1
#endif
#ifndef FALSE
#define FALSE 0
#endif
#ifndef MIN
#define MIN(a, b) ((a) < (b) ? (a) : (b))
#endif
#ifndef MAX
#define MAX(a, b) ((a) > (b) ? (a) : (b))
#endif

#define GINT_TO_POINTER(i) ((gpointer)(long)(i))
#define GPOINTER_TO_INT(p) ((gint)(long)(p))

typedef void (*GDestroyNotify)(gpointer data);
typedef guint (*GHashFunc)(gconstpointer key);
typedef gboolean (*GEqualFunc)(gconstpointer a, gconstpointer b);
typedef gint (*GCompareFunc)(gconstpointer a, gconstpointer b);

static gpointer g_malloc(gsize n) { return malloc(n); }
static void g_free(gpointer p) { free(p); }
#define g_new(type, count) ((type *)g_malloc(sizeof(type) * (count)))

static guint g_direct_hash(gconstpointer key) { return (guint)(long)key; }
static gboolean g_direct_equal(gconstpointer a, gconstpointer b) { return a == b; }

/* ------------------------------------------------------------------ */
/* GHashTable: append-array entries (insertion-order iteration) + an
 * open-addressed index of entry slots.                               */

typedef struct {
    gpointer key, value;
    int used; /* 1 live, 0 tombstone */
} _GHEntry;

typedef struct _GHashTable {
    GHashFunc hash;
    GEqualFunc equal;
    GDestroyNotify key_destroy, value_destroy;
    _GHEntry *entries;
    guint n_entries, cap_entries; /* append array (live + tombstones) */
    gint *index;                  /* hash slots -> entry idx, -1 empty */
    guint cap_index;              /* power of two */
    guint n_live;
} GHashTable;

static void _gh_index_insert(GHashTable *h, gpointer key, guint eidx) {
    guint mask = h->cap_index - 1;
    guint i = h->hash(key) & mask;
    while (h->index[i] >= 0)
        i = (i + 1) & mask;
    h->index[i] = (gint)eidx;
}

static void _gh_rehash(GHashTable *h, guint cap) {
    free(h->index);
    h->cap_index = cap;
    h->index = (gint *)malloc(sizeof(gint) * cap);
    for (guint i = 0; i < cap; ++i)
        h->index[i] = -1;
    for (guint e = 0; e < h->n_entries; ++e)
        if (h->entries[e].used)
            _gh_index_insert(h, h->entries[e].key, e);
}

static GHashTable *g_hash_table_new_full(GHashFunc hash, GEqualFunc equal,
                                         GDestroyNotify key_destroy,
                                         GDestroyNotify value_destroy) {
    GHashTable *h = (GHashTable *)malloc(sizeof(GHashTable));
    h->hash = hash ? hash : g_direct_hash;
    h->equal = equal ? equal : g_direct_equal;
    h->key_destroy = key_destroy;
    h->value_destroy = value_destroy;
    h->cap_entries = 16;
    h->n_entries = 0;
    h->entries = (_GHEntry *)malloc(sizeof(_GHEntry) * h->cap_entries);
    h->cap_index = 32;
    h->index = NULL;
    h->n_live = 0;
    _gh_rehash(h, h->cap_index);
    return h;
}

static GHashTable *g_hash_table_new(GHashFunc hash, GEqualFunc equal) {
    return g_hash_table_new_full(hash, equal, NULL, NULL);
}

static gint _gh_find(GHashTable *h, gconstpointer key) {
    guint mask = h->cap_index - 1;
    guint i = h->hash(key) & mask;
    while (h->index[i] >= 0) {
        _GHEntry *e = &h->entries[h->index[i]];
        if (e->used && h->equal(e->key, key))
            return h->index[i];
        i = (i + 1) & mask;
    }
    return -1;
}

static void g_hash_table_insert(GHashTable *h, gpointer key, gpointer value) {
    gint f = _gh_find(h, key);
    if (f >= 0) {
        if (h->value_destroy && h->entries[f].value)
            h->value_destroy(h->entries[f].value);
        h->entries[f].value = value;
        return;
    }
    if (h->n_entries == h->cap_entries) {
        h->cap_entries *= 2;
        h->entries = (_GHEntry *)realloc(h->entries,
                                         sizeof(_GHEntry) * h->cap_entries);
    }
    h->entries[h->n_entries].key = key;
    h->entries[h->n_entries].value = value;
    h->entries[h->n_entries].used = 1;
    _gh_index_insert(h, key, h->n_entries);
    h->n_entries++;
    h->n_live++;
    if (h->n_entries * 4 > h->cap_index * 3)
        _gh_rehash(h, h->cap_index * 2);
}

static gpointer g_hash_table_lookup(GHashTable *h, gconstpointer key) {
    gint f = _gh_find(h, key);
    return f >= 0 ? h->entries[f].value : NULL;
}

static gboolean g_hash_table_contains(GHashTable *h, gconstpointer key) {
    return _gh_find(h, key) >= 0;
}

static gboolean g_hash_table_remove(GHashTable *h, gconstpointer key) {
    gint f = _gh_find(h, key);
    if (f < 0)
        return FALSE;
    if (h->key_destroy)
        h->key_destroy(h->entries[f].key);
    if (h->value_destroy && h->entries[f].value)
        h->value_destroy(h->entries[f].value);
    h->entries[f].used = 0; /* tombstone; index rebuilt on next rehash */
    h->n_live--;
    _gh_rehash(h, h->cap_index);
    return TRUE;
}

static guint g_hash_table_size(GHashTable *h) { return h ? h->n_live : 0; }

static void g_hash_table_destroy(GHashTable *h) {
    if (!h)
        return;
    for (guint e = 0; e < h->n_entries; ++e)
        if (h->entries[e].used) {
            if (h->key_destroy)
                h->key_destroy(h->entries[e].key);
            if (h->value_destroy && h->entries[e].value)
                h->value_destroy(h->entries[e].value);
        }
    free(h->entries);
    free(h->index);
    free(h);
}

typedef struct {
    GHashTable *h;
    guint pos;
} GHashTableIter;

static void g_hash_table_iter_init(GHashTableIter *it, GHashTable *h) {
    it->h = h;
    it->pos = 0;
}

static gboolean g_hash_table_iter_next(GHashTableIter *it, gpointer *key,
                                       gpointer *value) {
    while (it->pos < it->h->n_entries) {
        _GHEntry *e = &it->h->entries[it->pos++];
        if (e->used) {
            if (key)
                *key = e->key;
            if (value)
                *value = e->value;
            return TRUE;
        }
    }
    return FALSE;
}

/* ------------------------------------------------------------------ */
/* GQueue / GList — layouts match glib so sizeof-based memory
 * accounting in the reference programs is unchanged.                 */

typedef struct _GList {
    gpointer data;
    struct _GList *next;
    struct _GList *prev;
} GList;

typedef struct {
    GList *head;
    GList *tail;
    guint length;
} GQueue;

static GQueue *g_queue_new(void) {
    GQueue *q = (GQueue *)malloc(sizeof(GQueue));
    q->head = q->tail = NULL;
    q->length = 0;
    return q;
}

static void g_queue_push_tail(GQueue *q, gpointer data) {
    GList *n = (GList *)malloc(sizeof(GList));
    n->data = data;
    n->next = NULL;
    n->prev = q->tail;
    if (q->tail)
        q->tail->next = n;
    else
        q->head = n;
    q->tail = n;
    q->length++;
}

static gpointer g_queue_pop_head(GQueue *q) {
    if (!q->head)
        return NULL;
    GList *n = q->head;
    gpointer data = n->data;
    q->head = n->next;
    if (q->head)
        q->head->prev = NULL;
    else
        q->tail = NULL;
    free(n);
    q->length--;
    return data;
}

static gboolean g_queue_is_empty(GQueue *q) { return q->length == 0; }

static void g_queue_free(GQueue *q) {
    while (!g_queue_is_empty(q))
        (void)g_queue_pop_head(q);
    free(q);
}

/* ------------------------------------------------------------------ */
/* GArray                                                             */

typedef struct {
    gchar *data;
    guint len;
    guint _cap;        /* shim-private */
    guint _elem_size;  /* shim-private */
} GArray;

static GArray *g_array_new(gboolean zero_terminated, gboolean clear,
                           guint element_size) {
    (void)zero_terminated;
    (void)clear;
    GArray *a = (GArray *)malloc(sizeof(GArray));
    a->_cap = 16;
    a->_elem_size = element_size;
    a->len = 0;
    a->data = (gchar *)malloc((gsize)a->_cap * element_size);
    return a;
}

static GArray *g_array_append_vals(GArray *a, gconstpointer data, guint n) {
    if (a->len + n > a->_cap) {
        while (a->len + n > a->_cap)
            a->_cap *= 2;
        a->data = (gchar *)realloc(a->data, (gsize)a->_cap * a->_elem_size);
    }
    memcpy(a->data + (gsize)a->len * a->_elem_size, data,
           (gsize)n * a->_elem_size);
    a->len += n;
    return a;
}

#define g_array_append_val(a, v) g_array_append_vals((a), &(v), 1)
#define g_array_index(a, type, i) (((type *)(void *)(a)->data)[(i)])

static void g_array_sort(GArray *a, GCompareFunc cmp) {
    qsort(a->data, a->len, a->_elem_size,
          (int (*)(const void *, const void *))cmp);
}

static gchar *g_array_free(GArray *a, gboolean free_segment) {
    gchar *seg = a->data;
    if (free_segment) {
        free(a->data);
        seg = NULL;
    }
    free(a);
    return seg;
}

#endif /* FV_GLIB_SHIM_H */
