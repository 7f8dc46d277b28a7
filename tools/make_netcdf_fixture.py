#!/usr/bin/env python3
"""Generate the classic-NetCDF test fixtures for NetcdfReader.

Hand-packed per the public NetCDF Classic Format Specification (Unidata,
NetCDF User's Guide appendix B) — an encoder independent of the Scala
parser, so the spec round-trip actually cross-checks the format logic.

Emits:
  src/test/resources/bathy_fixture.nc   CDF-1, NC_SHORT elevation with
                                        scale_factor/add_offset/_FillValue
                                        (the ETOPO/GEBCO shape)
  src/test/resources/bathy_fixture2.nc  CDF-2 (64-bit offsets), NC_FLOAT
                                        elevation, no decode attributes
"""
import struct
from pathlib import Path

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
SIZES = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4, NC_DOUBLE: 8}
FMTS = {NC_BYTE: 'b', NC_SHORT: 'h', NC_INT: 'i', NC_FLOAT: 'f', NC_DOUBLE: 'd'}

LATS = [50.0, 50.5, 51.0, 51.5]
LONS = [3.0, 3.25, 3.5, 3.75, 4.0]
FILL = -32768
# raw short cells: 10*i + j, one fill hole at (2, 3)
RAW = [[FILL if (i, j) == (2, 3) else 10 * i + j for j in range(len(LONS))]
       for i in range(len(LATS))]


def pad4(b: bytes) -> bytes:
    return b + b'\x00' * ((4 - len(b) % 4) % 4)


def name(s: str) -> bytes:
    b = s.encode()
    return struct.pack('>i', len(b)) + pad4(b)


def att(nm: str, typ: int, vals) -> bytes:
    raw = b''.join(struct.pack('>' + FMTS[typ], v) for v in vals)
    return name(nm) + struct.pack('>ii', typ, len(vals)) + pad4(raw)


def att_list(atts) -> bytes:
    if not atts:
        return struct.pack('>ii', 0, 0)          # ABSENT
    return struct.pack('>ii', 0x0C, len(atts)) + b''.join(atts)


def values(typ: int, flat) -> bytes:
    return pad4(b''.join(struct.pack('>' + FMTS[typ], v) for v in flat))


def build(version: int, elev_typ: int, elev_atts, elev_vals) -> bytes:
    begin_fmt = '>i' if version == 1 else '>q'
    begin_size = 4 if version == 1 else 8

    dims = [('lat', len(LATS)), ('lon', len(LONS))]
    # (name, dimids, atts, typ, flat values)
    variables = [
        ('lat', [0], [], NC_FLOAT, LATS),
        ('lon', [1], [], NC_FLOAT, LONS),
        ('elevation', [0, 1], elev_atts, elev_typ, elev_vals),
    ]

    def var_entry(nm, dimids, atts, typ, begin):
        return (name(nm) + struct.pack('>i', len(dimids))
                + b''.join(struct.pack('>i', d) for d in dimids)
                + att_list(atts) + struct.pack('>ii', typ, 0)  # vsize ignored
                + struct.pack(begin_fmt, begin))

    def header(begins):
        h = b'CDF' + bytes([version]) + struct.pack('>i', 0)  # numrecs
        h += struct.pack('>ii', 0x0A, len(dims))
        for dn, dl in dims:
            h += name(dn) + struct.pack('>i', dl)
        h += att_list([name('title') + struct.pack('>ii', NC_CHAR, 13)
                       + pad4(b'bathy fixture')])
        h += struct.pack('>ii', 0x0B, len(variables))
        for (nm, dimids, atts, typ, _), begin in zip(variables, begins):
            h += var_entry(nm, dimids, atts, typ, begin)
        return h

    hlen = len(header([0] * len(variables)))
    begins, off = [], hlen
    for nm, dimids, atts, typ, flat in variables:
        begins.append(off)
        off += len(values(typ, flat))
    out = header(begins)
    for nm, dimids, atts, typ, flat in variables:
        out += values(typ, flat)
    return out


def main():
    res = Path(__file__).resolve().parent.parent / 'src/test/resources'
    res.mkdir(parents=True, exist_ok=True)

    flat_short = [v for row in RAW for v in row]
    atts1 = [att('scale_factor', NC_DOUBLE, [0.5]),
             att('add_offset', NC_DOUBLE, [-100.0]),
             att('_FillValue', NC_SHORT, [FILL])]
    (res / 'bathy_fixture.nc').write_bytes(build(1, NC_SHORT, atts1, flat_short))

    flat_float = [float('nan') if v == FILL else v * 0.5 - 100.0 for v in flat_short]
    (res / 'bathy_fixture2.nc').write_bytes(build(2, NC_FLOAT, [], flat_float))
    print('wrote', res / 'bathy_fixture.nc', 'and bathy_fixture2.nc')


if __name__ == '__main__':
    main()
