#!/usr/bin/env python3
"""Generate the checked-in FileDescriptorSet fixture (person.desc) by
writing the protobuf wire format directly — the same bytes
`protoc --descriptor_set_out` would emit for:

    syntax = "proto3"; package graft;
    message Person {
      string name = 1;
      int64 id = 2;
      repeated int32 scores = 3;
      message Address { string city = 1; }
      Address addr = 4;
    }

Field numbers from the public google/protobuf/descriptor.proto.
Dev-only; the fixture is committed at
src/main/resources/graft/fixtures/person.desc.
"""
import pathlib


def varint(v: int) -> bytes:
    out = bytearray()
    while v > 0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def tag(num: int, wt: int) -> bytes:
    return varint((num << 3) | wt)


def ld(num: int, payload: bytes) -> bytes:  # length-delimited
    return tag(num, 2) + varint(len(payload)) + payload


def s(num: int, txt: str) -> bytes:
    return ld(num, txt.encode())


def vi(num: int, v: int) -> bytes:
    return tag(num, 0) + varint(v)


def field(name, number, label, ftype, type_name=None):
    b = s(1, name) + vi(3, number) + vi(4, label) + vi(5, ftype)
    if type_name:
        b += s(6, type_name)
    return b


# FieldDescriptorProto.Type: 3=int64, 5=int32, 9=string, 11=message
address = s(1, "Address") + ld(2, field("city", 1, 1, 9))
person = (
    s(1, "Person")
    + ld(2, field("name", 1, 1, 9))
    + ld(2, field("id", 2, 1, 3))
    + ld(2, field("scores", 3, 3, 5))
    + ld(2, field("addr", 4, 1, 11, ".graft.Person.Address"))
    + ld(3, address)  # nested_type
)
file_proto = s(1, "person.proto") + s(2, "graft") + ld(4, person)
fds = ld(1, file_proto)  # FileDescriptorSet.file

out = pathlib.Path(__file__).resolve().parents[1] / \
    "src/main/resources/graft/fixtures/person.desc"
out.parent.mkdir(parents=True, exist_ok=True)
out.write_bytes(fds)
print(f"wrote {len(fds)} bytes to {out}")
