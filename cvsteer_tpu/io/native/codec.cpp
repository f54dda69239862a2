// Native image codec for cvsteer_tpu: grayscale JPEG/PNG decode + PNG encode.
//
// TPU-native replacement for the reference's OpenCV highgui usage
// (cv::imread example/steer.cpp:73, cv::imwrite :106-122, cv::imdecode
// test/test.cpp:53-56). Exposed as a C ABI consumed via ctypes
// (cvsteer_tpu/io/native_codec.py); all calls release the GIL on the Python
// side, so the CLI's host decode pool runs these in parallel threads.
//
// Two-phase decode API (no allocation across the ABI):
//   cvsteer_decode_gray(data, size, NULL, &w, &h)   -> probe dimensions
//   cvsteer_decode_gray(data, size, buf,  &w, &h)   -> fill caller's buffer
// Returns 0 on success, negative error codes otherwise.

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErrorMgr {
    jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
    JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
    longjmp(err->setjmp_buffer, 1);
}

int decode_jpeg_gray(const uint8_t* data, size_t size, uint8_t* out, int* w,
                     int* h) {
    jpeg_decompress_struct cinfo;
    JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, size);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    cinfo.out_color_space = JCS_GRAYSCALE;
    jpeg_calc_output_dimensions(&cinfo);
    *w = static_cast<int>(cinfo.output_width);
    *h = static_cast<int>(cinfo.output_height);
    if (out == nullptr) {  // probe only
        jpeg_destroy_decompress(&cinfo);
        return 0;
    }
    jpeg_start_decompress(&cinfo);
    const size_t stride = cinfo.output_width;
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out + cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

int decode_png_gray(const uint8_t* data, size_t size, uint8_t* out, int* w,
                    int* h) {
    png_image image;
    memset(&image, 0, sizeof(image));
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&image, data, size)) return -3;
    image.format = PNG_FORMAT_GRAY;
    *w = static_cast<int>(image.width);
    *h = static_cast<int>(image.height);
    if (out == nullptr) {
        png_image_free(&image);
        return 0;
    }
    if (!png_image_finish_read(&image, nullptr, out, 0, nullptr)) {
        png_image_free(&image);
        return -3;
    }
    return 0;
}

}  // namespace

extern "C" {

// Decode JPEG/PNG (sniffed by magic) to 8-bit grayscale, row-major.
// out == NULL probes (w, h) only. Returns 0 on success.
int cvsteer_decode_gray(const uint8_t* data, size_t size, uint8_t* out,
                        int* w, int* h) {
    if (data == nullptr || size < 4 || w == nullptr || h == nullptr) return -1;
    if (data[0] == 0xFF && data[1] == 0xD8) {
        return decode_jpeg_gray(data, size, out, w, h);
    }
    if (data[0] == 0x89 && data[1] == 'P' && data[2] == 'N' && data[3] == 'G') {
        return decode_png_gray(data, size, out, w, h);
    }
    return -4;  // unknown format
}

// Read a whole file then decode (same two-phase contract).
int cvsteer_read_gray(const char* path, uint8_t* out, int* w, int* h) {
    FILE* f = fopen(path, "rb");
    if (f == nullptr) return -5;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (n <= 0) {
        fclose(f);
        return -5;
    }
    uint8_t* buf = static_cast<uint8_t*>(malloc(static_cast<size_t>(n)));
    if (buf == nullptr) {
        fclose(f);
        return -6;
    }
    const size_t got = fread(buf, 1, static_cast<size_t>(n), f);
    fclose(f);
    if (got != static_cast<size_t>(n)) {
        free(buf);
        return -5;
    }
    const int rc = cvsteer_decode_gray(buf, got, out, w, h);
    free(buf);
    return rc;
}

// Write 8-bit grayscale PNG. Returns 0 on success.
int cvsteer_write_png_gray(const char* path, const uint8_t* img, int w,
                           int h) {
    if (path == nullptr || img == nullptr || w <= 0 || h <= 0) return -1;
    png_image image;
    memset(&image, 0, sizeof(image));
    image.version = PNG_IMAGE_VERSION;
    image.width = static_cast<png_uint_32>(w);
    image.height = static_cast<png_uint_32>(h);
    image.format = PNG_FORMAT_GRAY;
    if (!png_image_write_to_file(&image, path, 0, img, 0, nullptr)) return -7;
    return 0;
}

}  // extern "C"
