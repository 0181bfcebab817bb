/* Oracle harness for verifying the engine's arithmetic-coded JPEG
 * decoder against the system libjpeg-turbo (public IJG/turbo code,
 * shipped in this container as libjpeg62-turbo-dev).
 *
 * Modes:
 *   encode  in.pnm out.jpg quality progressive(0|1) restart_interval
 *       - compress a P5/P6 PNM with cinfo.arith_code = TRUE
 *   coefs   in.jpg
 *       - print the QUANTIZED DCT coefficients (jpeg_read_coefficients):
 *         "comp <ci> <h_blocks> <w_blocks>" then one line of 64 ints per
 *         block in raster block order. Coefficients are exact integers,
 *         independent of any IDCT/color-convert differences — the
 *         bit-exact gate for an entropy decoder.
 *   dumptab
 *       - print the 114 packed INT32s of jpeg_aritab (the authoritative
 *         ITU-T T.81 Table D.3 state machine as shipped in libjpeg).
 *
 * Build: gcc -O2 -o /tmp/jpeg_arith_oracle tools/jpeg_arith_oracle.c -ljpeg
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

extern const INT32 jpeg_aritab[];

static void die(const char *msg) { fprintf(stderr, "%s\n", msg); exit(1); }

static unsigned char *read_pnm(const char *path, int *w, int *h, int *ch) {
    FILE *f = fopen(path, "rb");
    if (!f) die("cannot open pnm");
    char magic[3] = {0};
    int maxv;
    if (fscanf(f, "%2s %d %d %d", magic, w, h, &maxv) != 4) die("bad pnm header");
    fgetc(f); /* single whitespace after maxval */
    *ch = strcmp(magic, "P6") == 0 ? 3 : 1;
    size_t nbytes = (size_t)(*w) * (*h) * (*ch);
    unsigned char *buf = malloc(nbytes);
    if (fread(buf, 1, nbytes, f) != nbytes) die("short pnm");
    fclose(f);
    return buf;
}

static int do_encode(const char *in, const char *out, int quality,
                     int progressive, int restart) {
    int w, h, ch;
    unsigned char *pix = read_pnm(in, &w, &h, &ch);
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    FILE *f = fopen(out, "wb");
    if (!f) die("cannot open output");
    jpeg_stdio_dest(&cinfo, f);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = ch;
    cinfo.in_color_space = ch == 3 ? JCS_RGB : JCS_GRAYSCALE;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    cinfo.arith_code = TRUE;
    cinfo.restart_interval = restart;
    if (progressive) jpeg_simple_progression(&cinfo);
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = pix + (size_t)cinfo.next_scanline * w * ch;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    fclose(f);
    free(pix);
    return 0;
}

static int do_coefs(const char *in) {
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    FILE *f = fopen(in, "rb");
    if (!f) die("cannot open input");
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    jvirt_barray_ptr *coefs = jpeg_read_coefficients(&cinfo);
    for (int ci = 0; ci < cinfo.num_components; ci++) {
        jpeg_component_info *comp = &cinfo.comp_info[ci];
        printf("comp %d %d %d\n", ci, (int)comp->height_in_blocks,
               (int)comp->width_in_blocks);
        for (JDIMENSION by = 0; by < comp->height_in_blocks; by++) {
            JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
                (j_common_ptr)&cinfo, coefs[ci], by, 1, FALSE);
            for (JDIMENSION bx = 0; bx < comp->width_in_blocks; bx++) {
                for (int k = 0; k < DCTSIZE2; k++)
                    printf("%d ", rows[0][bx][k]);
                printf("\n");
            }
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 2 && strcmp(argv[1], "dumptab") == 0) {
        for (int i = 0; i < 114; i++) printf("%ld\n", (long)jpeg_aritab[i]);
        return 0;
    }
    if (argc == 7 && strcmp(argv[1], "encode") == 0)
        return do_encode(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]),
                         atoi(argv[6]));
    if (argc == 3 && strcmp(argv[1], "coefs") == 0)
        return do_coefs(argv[2]);
    die("usage: encode in.pnm out.jpg q prog rst | coefs in.jpg | dumptab");
    return 1;
}
