"""Ogg (RFC 3533) and MP4 (ISO BMFF) container parsing: page/box walks,
packet reassembly across lacing and pages, spec CRC, metadata math,
corruption guards."""

import struct

import pytest

from mysql_secure_agent_spark.operators.containers import (
    build_mp4,
    build_ogg,
    ogg_crc,
    parse_mp4,
    parse_ogg,
)


def test_ogg_packet_reassembly_and_flags():
    # lengths straddle the 255-lacing boundary and cross pages
    pkts = [b"a" * 10, b"b" * 255, b"c" * 600, b"d" * 3, b"e" * 1]
    data = build_ogg(pkts, serial=77, granule_step=480, packets_per_page=2)
    info = parse_ogg(data)
    assert info["packets"] == pkts
    assert info["serials"] == [77]
    assert info["bos_pages"] == 1 and info["eos_pages"] == 1
    assert info["final_granule"] == len(pkts) * 480


def test_ogg_crc_is_the_spec_crc_not_zlib():
    import zlib

    data = b"OggS payload bytes for crc"
    assert ogg_crc(data) != zlib.crc32(data)
    assert ogg_crc(b"") == 0
    # tamper detection: flip one body byte
    stream = bytearray(build_ogg([b"x" * 50]))
    stream[40] ^= 1
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg(bytes(stream))
    # verify_crc=False tolerates it (salvage mode)
    parse_ogg(bytes(stream), verify_crc=False)


def test_ogg_guards():
    with pytest.raises(ValueError, match="capture"):
        parse_ogg(b"NotOgg" + bytes(30))
    # a stream that ends mid-packet (255-lacing with no continuation)
    data = bytearray(build_ogg([b"y" * 255 + b"z" * 10]))
    # truncate to the first page only keeping its header intact is hard to
    # fabricate by slicing; instead corrupt the version byte
    data[4] = 9
    with pytest.raises(ValueError, match="version"):
        parse_ogg(bytes(data))


def test_mp4_two_track_metadata():
    m = build_mp4(
        timescale=1000,
        duration=7500,
        tracks=[
            {"handler": "vide", "codec": "avc1", "timescale": 30000,
             "duration": 225000, "n_samples": 225},
            {"handler": "soun", "codec": "mp4a", "timescale": 48000,
             "duration": 360000, "n_samples": 352},
        ],
    )
    out = parse_mp4(m)
    assert out["brand"] == "isom"
    assert out["duration_s"] == 7.5
    assert [t["codec"] for t in out["tracks"]] == ["avc1", "mp4a"]
    assert [t["handler"] for t in out["tracks"]] == ["vide", "soun"]
    assert out["tracks"][0]["duration_s"] == 7.5
    assert out["tracks"][1]["n_samples"] == 352


def test_mp4_largesize_box_and_guards():
    m = bytearray(build_mp4(tracks=[]))
    # rewrite mdat as a 64-bit largesize box: size=1 + 8-byte largesize
    i = bytes(m).find(b"mdat") - 4
    body = m[i + 8 :]
    large = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(body))
        + bytes(body)
    )
    out = parse_mp4(bytes(m[:i]) + large)
    assert out["brand"] == "isom"
    with pytest.raises(ValueError, match="missing ftyp|corrupt"):
        parse_mp4(b"\x00\x00\x00\x08free")
    # truncated box size past end
    bad = bytearray(build_mp4(tracks=[]))
    bad[0:4] = struct.pack(">I", 1 << 30)
    with pytest.raises(ValueError, match="corrupt"):
        parse_mp4(bytes(bad))


def test_sniffer_routes_containers():
    from mysql_secure_agent_spark.operators.multimodal import _sniff_mime

    assert _sniff_mime(build_mp4(tracks=[])) == "video/mp4"
    assert _sniff_mime(build_ogg([b"p" * 9])) == "audio/ogg"


def test_ogg_page_split_and_multiplexed_streams():
    """Review findings: >255 lacing segments must split pages
    (continuation pages carry flag 0x01 and granule -1 when no packet
    completes), and packet reassembly is per logical bitstream so
    grouped/multiplexed files interleave cleanly."""
    big = [b"x" * 70000, b"y" * 33000, b"z" * 33000]
    data = build_ogg(big, packets_per_page=2)
    info = parse_ogg(data)
    assert info["packets"] == big
    assert info["n_pages"] > 1

    # hand-build a multiplexed stream: a serial-1 packet continued across
    # its pages with a serial-2 page interleaved between them
    s1 = build_ogg([b"a" * 400], serial=1, packets_per_page=1)
    pages1 = []
    pos = 0
    while pos < len(s1):
        nsegs = s1[pos + 26]
        body = sum(s1[pos + 27 : pos + 27 + nsegs])
        end = pos + 27 + nsegs + body
        pages1.append(s1[pos:end])
        pos = end
    s2 = build_ogg([b"b" * 10], serial=2, packets_per_page=1)
    if len(pages1) == 1:
        # force a continued packet: 400 < 255*2 means one page; rebuild
        # with a packet long enough to split across pages
        s1 = build_ogg([b"a" * 70000], serial=1, packets_per_page=1)
        pages1, pos = [], 0
        while pos < len(s1):
            nsegs = s1[pos + 26]
            body = sum(s1[pos + 27 : pos + 27 + nsegs])
            end = pos + 27 + nsegs + body
            pages1.append(s1[pos:end])
            pos = end
    assert len(pages1) >= 2
    mux = pages1[0] + s2 + b"".join(pages1[1:])
    info = parse_ogg(mux)
    assert sorted(len(p) for p in info["packets"]) == [10, 70000]
    assert sorted(info["serials"]) == [1, 2]


def test_ogg_codec_identification():
    from mysql_secure_agent_spark.operators.containers import (
        identify_ogg_codec,
    )

    vorbis_id = (
        b"\x01vorbis" + bytes(4) + bytes([2]) + (44100).to_bytes(4, "little")
        + bytes(13)
    )
    opus_id = (
        b"OpusHead\x01" + bytes([2]) + bytes(2) + (48000).to_bytes(4, "little")
        + bytes(3)
    )
    assert identify_ogg_codec(vorbis_id) == {
        "codec": "vorbis", "channels": 2, "sample_rate": 44100
    }
    assert identify_ogg_codec(opus_id) == {
        "codec": "opus", "channels": 2, "sample_rate": 48000
    }
    assert identify_ogg_codec(b"\x80theora" + bytes(20))["codec"] == "theora"
    assert identify_ogg_codec(b"\x7fFLAC..")["codec"] == "flac"
    assert identify_ogg_codec(b"whatever")["codec"] == "unknown"

    # through the page walk: first packet of the stream identifies it
    data = build_ogg([vorbis_id, b"payload1", b"payload2"], serial=9)
    info = parse_ogg(data)
    assert info["streams"][9]["codec"] == "vorbis"
    assert info["streams"][9]["sample_rate"] == 44100


def test_avi_roundtrip_and_guards():
    from mysql_secure_agent_spark.operators.containers import (
        build_avi,
        parse_avi,
    )

    a = build_avi(
        width=640, height=480, n_frames=250, fps=25.0,
        streams=[
            {"type": "vids", "handler": "MJPG", "scale": 1, "rate": 25,
             "length": 250},
            {"type": "auds", "handler": "\x01\x00\x00\x00", "scale": 1,
             "rate": 44100, "length": 441000},
        ],
    )
    out = parse_avi(a)
    assert (out["width"], out["height"], out["n_frames"]) == (640, 480, 250)
    assert out["fps"] == 25.0
    assert [s["type"] for s in out["streams"]] == ["vids", "auds"]
    assert out["streams"][0]["duration_s"] == 10.0
    assert out["streams"][1]["duration_s"] == 10.0
    with pytest.raises(ValueError, match="not an AVI"):
        parse_avi(b"RIFF\x00\x00\x00\x00WAVE")
    # corrupt chunk size past end
    bad = bytearray(a)
    bad[16:20] = (1 << 30).to_bytes(4, "little")
    with pytest.raises(ValueError, match="corrupt"):
        parse_avi(bytes(bad))


def test_extract_media_meta_container_catalog(spark):
    """The catalog integration: extract_media_meta(container_meta=True)
    walks recognized containers into a JSON column; torn payloads yield
    NULL instead of failing the Arrow batch."""
    import json

    from mysql_secure_agent_spark.operators.containers import (
        build_avi,
        build_mp4,
        build_ogg,
    )
    from mysql_secure_agent_spark.operators.multimodal import (
        extract_media_meta,
    )

    vorbis_id = (
        b"\x01vorbis" + bytes(4) + bytes([2]) + (44100).to_bytes(4, "little")
        + bytes(13)
    )
    rows = [
        (1, "audio", build_ogg([vorbis_id, b"pkt"]), None),
        (2, "video", build_mp4(
            duration=2500,
            tracks=[{"handler": "vide", "codec": "avc1", "timescale": 30000,
                     "duration": 75000, "n_samples": 75}],
        ), None),
        (3, "video", build_avi(n_frames=50, fps=25.0), None),
        (4, "video", b"RIFF\x00\x00\x00\x00AVI torn", None),  # torn
        (5, "image", b"P6\n1 1\n255\n\x00\x00\x00", None),  # not a container
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    out = {r["media_id"]: r for r in
           extract_media_meta(df, container_meta=True).collect()}
    ogg = json.loads(out[1]["container"])
    assert ogg["codecs"] == ["vorbis"] and ogg["n_packets"] == 2
    mp4 = json.loads(out[2]["container"])
    assert mp4["duration_s"] == 2.5 and mp4["codecs"] == ["avc1"]
    avi = json.loads(out[3]["container"])
    assert avi["fps"] == 25.0 and avi["handlers"] == ["MJPG"]
    assert out[4]["container"] is None  # torn: NULL, batch survived
    assert out[5]["container"] is None  # image: not a container
    # the base columns are unchanged
    assert out[1]["mime"] == "audio/ogg" and out[1]["sha256"]
