// Minimal no-op Qt5 stand-ins, just enough to compile the reference
// procgen sources (/root/reference/procgen/src) WITHOUT Qt for state-level
// conformance testing.  Drawing is discarded: only game-state math matters
// for the golden rollout dumps, and the reference never reads pixels back
// into state (render_buf is excluded from serialize, game.cpp:216).
//
// QImage DOES report the real PNG dimensions (parsed from the IHDR chunk):
// fit_aspect_ratio/match_aspect_ratio (bag.cpp:1025-1049) write asset
// aspect ratios into entity rx/ry, which are serialized state and feed
// collision geometry -- a fixed stub size would corrupt the golden dumps.
#pragma once

#include <memory>
#include <string>
#include <map>
#include <vector>

#include <cstdio>
#include <cstring>

typedef unsigned char uchar;

class QString {
  public:
    QString() {}
    QString(const char *s) : s_(s) {}
    std::string s_;
};

class QColor {
  public:
    QColor() : r_(0), g_(0), b_(0), a_(255) {}
    QColor(int r, int g, int b, int a = 255) : r_(r), g_(g), b_(b), a_(a) {}
    void setAlpha(int a) { a_ = a; }
    int red() const { return r_; }
    int green() const { return g_; }
    int blue() const { return b_; }
    int r_, g_, b_, a_;
};

class QPointF {
  public:
    QPointF() : x_(0), y_(0) {}
    QPointF(double x, double y) : x_(x), y_(y) {}
    double x() const { return x_; }
    double y() const { return y_; }
    double x_, y_;
};

class QRect {
  public:
    QRect() : x_(0), y_(0), w_(0), h_(0) {}
    QRect(int x, int y, int w, int h) : x_(x), y_(y), w_(w), h_(h) {}
    int x() const { return x_; }
    int y() const { return y_; }
    int width() const { return w_; }
    int height() const { return h_; }
    int x_, y_, w_, h_;
};

class QRectF {
  public:
    QRectF() : x_(0), y_(0), w_(0), h_(0) {}
    QRectF(double x, double y, double w, double h)
        : x_(x), y_(y), w_(w), h_(h) {}
    QRectF(const QRect &r) : x_(r.x_), y_(r.y_), w_(r.w_), h_(r.h_) {}
    double x() const { return x_; }
    double y() const { return y_; }
    double width() const { return w_; }
    double height() const { return h_; }
    QPointF center() const { return QPointF(x_ + w_ / 2, y_ + h_ / 2); }
    double x_, y_, w_, h_;
};

class QImage {
  public:
    enum Format { Format_Invalid, Format_RGB32, Format_ARGB32, Format_ARGB32_Premultiplied };
    QImage() : w_(64), h_(64) {}
    QImage(int w, int h, Format) : w_(w), h_(h) {}
    QImage(const QString &path) : w_(64), h_(64) {
        // real dimensions from the PNG IHDR (big-endian w,h at bytes 16..23)
        FILE *f = fopen(path.s_.c_str(), "rb");
        if (f) {
            unsigned char hdr[24];
            if (fread(hdr, 1, 24, f) == 24 && memcmp(hdr + 1, "PNG", 3) == 0) {
                w_ = (hdr[16] << 24) | (hdr[17] << 16) | (hdr[18] << 8) | hdr[19];
                h_ = (hdr[20] << 24) | (hdr[21] << 16) | (hdr[22] << 8) | hdr[23];
            }
            fclose(f);
        }
    }
    QImage(unsigned char *, int w, int h, int, Format) : w_(w), h_(h) {}
    QImage convertToFormat(Format) const { return *this; }
    QImage mirrored(bool, bool) const { return *this; }
    bool save(const QString &) const { return true; }
    int width() const { return w_; }
    int height() const { return h_; }
    int w_, h_;
};

class QBrush {
  public:
    QBrush() {}
    QBrush(const QColor &) {}
};

class QPen {
  public:
    QPen() {}
    QPen(const QColor &, int thickness = 1) {}
};

namespace Qt {
enum PenStyle { NoPen };
}

class QPainter {
  public:
    enum RenderHint { Antialiasing, SmoothPixmapTransform };
    enum CompositionMode { CompositionMode_Source, CompositionMode_SourceOver };
    QPainter() {}
    QPainter(QImage *) {}
    void setRenderHint(RenderHint, bool = true) {}
    void setCompositionMode(CompositionMode) {}
    void fillRect(const QRectF &, const QColor &) {}
    void fillRect(const QRect &, const QColor &) {}
    void drawImage(const QRectF &, const QImage &) {}
    void drawImage(const QRect &, const QImage &) {}
    void drawEllipse(const QRectF &) {}
    void drawEllipse(const QPointF &, double, double) {}
    void drawLine(const QPointF &, const QPointF &) {}
    void drawLine(double, double, double, double) {}
    void setPen(const QPen &) {}
    void setPen(Qt::PenStyle) {}
    void setBrush(const QBrush &) {}
    void setOpacity(double) {}
    void save() {}
    void restore() {}
    void translate(double, double) {}
    void rotate(double) {}
};
