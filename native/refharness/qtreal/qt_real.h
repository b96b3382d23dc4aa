// ABI-shim Qt5 headers: compile the reference procgen sources against the
// REAL libQt5Gui/libQt5Core runtime (no Qt dev headers in this image), so
// refdump's sibling `pixdump` produces the reference's ACTUAL Qt-rasterized
// frames for pixel conformance (tools/pixel_conformance.py).
//
// How this works: every method here is either
//   (a) declared WITHOUT a body, with a signature whose Itanium mangling
//       matches an exported symbol of libQt5Gui.so.5 / libQt5Core.so.5
//       (verified with `nm -D`), so calls bind to the real implementation;
//   (b) an inline value-type (QRect/QRectF/QPoint/QPointF/QLineF) whose
//       byte layout replicates Qt 5.15's exactly (QRect stores x1,y1,x2,y2
//       with INCLUSIVE bottom-right; QRectF stores x,y,w,h); or
//   (c) an inline wrapper that delegates to an exported symbol (QString
//       construction via fromUtf8_helper, QColor via setRgb).
//
// Classes with private d-pointers (QImage, QPainter, QPen, QBrush,
// QString) are declared with PADDED storage (>= the real sizeof); the real
// exported constructors/destructors manage the actual layout inside that
// storage, including vtables for QPaintDevice-derived types.
#pragma once

// the reference sources lean on the Qt headers transitively providing
// these (same as qtstub/qt_stub.h)
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <vector>

typedef unsigned char uchar;
typedef unsigned int uint;
typedef unsigned short ushort;
typedef double qreal;

// --- Qt namespace enums (values are the stable public Qt 5 ABI) ---------
namespace Qt {
enum GlobalColor { color0 = 0, color1, black, white, darkGray, gray };
enum PenStyle { NoPen = 0, SolidLine = 1 };
enum PenCapStyle { FlatCap = 0x00, SquareCap = 0x10, RoundCap = 0x20 };
enum PenJoinStyle { MiterJoin = 0x00, BevelJoin = 0x40, RoundJoin = 0x80 };
enum BrushStyle { NoBrush = 0, SolidPattern = 1 };
enum ImageConversionFlag { AutoColor = 0 };
enum AspectRatioMode { IgnoreAspectRatio = 0, KeepAspectRatio = 1 };
enum TransformationMode { FastTransformation = 0, SmoothTransformation = 1 };
}  // namespace Qt

// Real Qt's QFlags is a global-scope template; signatures below must
// mangle as 6QFlagsIN2Qt19ImageConversionFlagEE.
template <typename Enum>
class QFlags {
  public:
    int i;
    constexpr inline QFlags(Enum e) : i(int(e)) {}
    constexpr inline QFlags() : i(0) {}
};

namespace Qt {
typedef QFlags<ImageConversionFlag> ImageConversionFlags;
}

// --- value types (inline, exact Qt 5.15 layouts) -------------------------
class QPoint {
  public:
    int xp, yp;
    inline QPoint() : xp(0), yp(0) {}
    inline QPoint(int x, int y) : xp(x), yp(y) {}
    inline int x() const { return xp; }
    inline int y() const { return yp; }
};

class QPointF {
  public:
    qreal xp, yp;
    inline QPointF() : xp(0), yp(0) {}
    inline QPointF(qreal x, qreal y) : xp(x), yp(y) {}
    inline qreal x() const { return xp; }
    inline qreal y() const { return yp; }
};

class QRect {
  public:
    // Qt stores the INCLUSIVE bottom-right corner
    int x1, y1, x2, y2;
    inline QRect() : x1(0), y1(0), x2(-1), y2(-1) {}
    inline QRect(int x, int y, int w, int h)
        : x1(x), y1(y), x2(x + w - 1), y2(y + h - 1) {}
    inline int x() const { return x1; }
    inline int y() const { return y1; }
    inline int width() const { return x2 - x1 + 1; }
    inline int height() const { return y2 - y1 + 1; }
};

class QRectF {
  public:
    qreal xp, yp, w, h;
    inline QRectF() : xp(0), yp(0), w(0), h(0) {}
    inline QRectF(qreal x, qreal y, qreal ww, qreal hh)
        : xp(x), yp(y), w(ww), h(hh) {}
    inline QRectF(const QRect &r)
        : xp(r.x1), yp(r.y1), w(r.x2 - r.x1 + 1), h(r.y2 - r.y1 + 1) {}
    inline qreal x() const { return xp; }
    inline qreal y() const { return yp; }
    inline qreal width() const { return w; }
    inline qreal height() const { return h; }
    inline QPointF center() const { return QPointF(xp + w / 2, yp + h / 2); }
};

class QLineF {
  public:
    QPointF pt1, pt2;
    inline QLineF(const QPointF &a, const QPointF &b) : pt1(a), pt2(b) {}
    inline QLineF(qreal ax, qreal ay, qreal bx, qreal by)
        : pt1(ax, ay), pt2(bx, by) {}
};

// --- QString: real refcounted string via exported helpers ----------------
class QChar;
class QString {
  public:
    void *d;
    static QString fromUtf8_helper(const char *, int);  // _ZN7QString15fromUtf8_helperEPKci
    // QString's copy ctor and dtor are inline in real Qt (refcount ops on
    // d) and NOT exported.  This build copies shallow and never derefs:
    // the net refcount effect of (shallow copy + no-op dtor) is zero, and
    // the few path strings created here are intentionally leaked.
    inline QString() : d(nullptr) {}
    inline QString(const QString &o) : d(o.d) {}
    inline ~QString() {}
    inline QString(const char *s) {
        // the real inline fromUtf8 wrapper strlen's before calling the
        // helper; the helper itself does NOT accept -1
        QString t = fromUtf8_helper(s, int(strlen(s)));
        d = t.d;
    }
    inline QString(const std::string &s) {
        QString t = fromUtf8_helper(s.c_str(), int(s.size()));
        d = t.d;
    }
};

// --- QColor: inline 16-byte value, real setters/getters ------------------
class QColor {
  public:
    int cspec;        // 0 = Invalid, 1 = Rgb
    ushort ct[5];     // alpha, red, green, blue, pad (16-bit scaled)
    void setRgb(int, int, int, int);  // _ZN6QColor6setRgbEiiii
    void setAlpha(int);               // _ZN6QColor8setAlphaEi
    int red() const;                  // _ZNK6QColor3redEv
    int green() const;
    int blue() const;
    int alpha() const;
    inline QColor() : cspec(0) { ct[0] = ct[1] = ct[2] = ct[3] = ct[4] = 0; }
    inline QColor(int r, int g, int b, int a = 255) { setRgb(r, g, b, a); }
};

// --- QPaintDevice / QImage ----------------------------------------------
class QPaintEngine;

class QPaintDevice {
  public:
    virtual ~QPaintDevice();
    virtual int devType() const;
    // pure in real Qt; declared non-pure here so MY declaration stays
    // concrete (the real vtable installed by QImage's exported ctor is
    // what any virtual dispatch actually hits)
    virtual QPaintEngine *paintEngine() const;
    virtual int metric(int) const;
    virtual void initPainter(class QPainter *) const;
    virtual QPaintDevice *redirected(QPoint *) const;
    virtual class QPainter *sharedPainter() const;
    // real layout: ushort painters + QPaintDevicePrivate *reserved
    ushort painters_;
    void *reserved_;

  protected:
    inline QPaintDevice() {}  // never called: QImage's real ctor builds all
};

class QImage : public QPaintDevice {
  public:
    enum Format {
        Format_Invalid = 0,
        Format_Mono = 1,
        Format_RGB32 = 4,
        Format_ARGB32 = 5,
        Format_ARGB32_Premultiplied = 6,
    };
    void *dptr;       // QImageData *d
    char pad_[32];    // headroom over the real sizeof

    QImage();                                   // _ZN6QImageC1Ev
    QImage(int, int, Format);                   // _ZN6QImageC1EiiNS_6FormatE
    QImage(const QString &, const char *format = nullptr);
    QImage(uchar *, int, int, int, Format, void (*)(void *) = nullptr,
           void * = nullptr);
    QImage(const QImage &);                     // _ZN6QImageC1ERKS_
    ~QImage();                                  // _ZN6QImageD1Ev
    QImage &operator=(const QImage &);          // _ZN6QImageaSERKS_
    int width() const;                          // _ZNK6QImage5widthEv
    int height() const;
    int bytesPerLine() const;
    uchar *bits();                              // _ZN6QImage4bitsEv
    const uchar *constBits() const;
    void fill(uint);                            // _ZN6QImage4fillEj
    void fill(const QColor &);
    QImage convertToFormat(
        Format, Qt::ImageConversionFlags = Qt::AutoColor) const;
    QImage mirrored(bool horizontally = false, bool vertically = true) const;
    bool save(const QString &, const char *format = nullptr,
              int quality = -1) const;
};

// --- QPen / QBrush: padded d-pointer types -------------------------------
class QBrush {
  public:
    void *d;
    char pad_[8];
    QBrush();                                        // _ZN6QBrushC1Ev
    QBrush(const QColor &, Qt::BrushStyle = Qt::SolidPattern);
    QBrush(const QBrush &);
    ~QBrush();
    QBrush &operator=(const QBrush &);
};

class QPen {
  public:
    void *d;
    char pad_[8];
    QPen();                                          // _ZN4QPenC1Ev
    QPen(const QColor &);                            // _ZN4QPenC1ERK6QColor
    QPen(Qt::PenStyle);
    QPen(const QBrush &, qreal, Qt::PenStyle = Qt::SolidLine,
         Qt::PenCapStyle = Qt::SquareCap, Qt::PenJoinStyle = Qt::BevelJoin);
    QPen(const QPen &);
    ~QPen();
    QPen &operator=(const QPen &);
    // reference constructs QPen(color, thickness): real Qt inline resolves
    // to the (QBrush, qreal, ...) ctor
    inline QPen(const QColor &c, qreal width)
        : QPen(QBrush(c), width, Qt::SolidLine, Qt::SquareCap,
               Qt::BevelJoin) {}
};

// --- QPainter ------------------------------------------------------------
class QPainter {
  public:
    enum RenderHint {
        Antialiasing = 0x01,
        TextAntialiasing = 0x02,
        SmoothPixmapTransform = 0x04,
    };
    enum CompositionMode {
        CompositionMode_SourceOver = 0,
        CompositionMode_Source = 2,
    };
    void *d;
    char pad_[8];
    QPainter();                        // _ZN8QPainterC1Ev
    QPainter(QPaintDevice *);          // _ZN8QPainterC1EP12QPaintDevice
    ~QPainter();                       // _ZN8QPainterD1Ev
    bool begin(QPaintDevice *);
    bool end();
    void setRenderHint(RenderHint, bool on = true);
    void setCompositionMode(CompositionMode);
    void setOpacity(qreal);
    void save();                       // _ZN8QPainter4saveEv
    void restore();
    void translate(const QPointF &);   // _ZN8QPainter9translateERK7QPointF
    inline void translate(qreal dx, qreal dy) { translate(QPointF(dx, dy)); }
    void rotate(qreal);                // _ZN8QPainter6rotateEd
    void setPen(const QPen &);
    void setPen(const QColor &);
    void setPen(Qt::PenStyle);
    void setBrush(const QBrush &);
    void setBrush(Qt::BrushStyle);
    void fillRect(const QRectF &, const QColor &);
    void fillRect(const QRect &, const QColor &);
    void fillRect(const QRectF &, const QBrush &);
    void drawImage(const QRectF &, const QImage &, const QRectF &,
                   Qt::ImageConversionFlags = Qt::AutoColor);
    void drawRect(const QRectF &);
    void drawEllipse(const QRectF &);
    void drawEllipse(const QRect &);
    void drawLines(const QLineF *, int);
    void drawLines(const QPointF *, int);
    // inline Qt wrappers the reference calls
    inline void drawImage(const QRectF &target, const QImage &img) {
        drawImage(target,
                  img,
                  QRectF(0, 0, qreal(img.width()), qreal(img.height())));
    }
    inline void drawImage(const QRect &target, const QImage &img) {
        drawImage(QRectF(target), img);
    }
    inline void drawEllipse(const QPointF &c, qreal rx, qreal ry) {
        drawEllipse(QRectF(c.xp - rx, c.yp - ry, 2 * rx, 2 * ry));
    }
    inline void drawLine(const QPointF &a, const QPointF &b) {
        QLineF l(a, b);
        drawLines(&l, 1);
    }
    inline void drawLine(qreal x1, qreal y1, qreal x2, qreal y2) {
        QLineF l(x1, y1, x2, y2);
        drawLines(&l, 1);
    }
};

// --- QGuiApplication: needed so the raster paint engine + font database
// initialize; run with QT_QPA_PLATFORM=offscreen --------------------------
class QGuiApplication {
  public:
    // generous headroom over the real object; allocate on the HEAP (a
    // stack instance corrupted the caller frame in testing)
    char pad_[256];
    QGuiApplication(int &, char **, int = 0x060000 /* ApplicationFlags */);
    ~QGuiApplication();
};
