"""Minimal pure-Python protobuf runtime for the transformWithState
state-server protocol.

PySpark 4's ``transformWithStateInPandas`` Python worker speaks a
protobuf protocol to the JVM state server
(``pyspark/sql/streaming/proto/StateMessage_pb2`` — generated code that
needs the ``google.protobuf`` runtime). This container does not bake in
protobuf, which left the engine's timer/TTL operators
(``streaming/stateful.py``) permanently environment-gated.

The protocol surface is tiny and fixed: proto3, scalar fields
(int32/int64/bool/string/bytes/enum), singular nested messages, and
repeated bytes/messages — no maps, no extensions, no packed repeateds,
no reflection beyond what the generated module itself performs. This
module implements exactly that subset from the public wire-format and
descriptor.proto specifications (https://protobuf.dev/programming-guides/encoding/):

- a varint/length-delimited wire codec,
- a ``FileDescriptorProto`` parser (descriptor.proto is itself a
  protobuf message; ``AddSerializedFile`` receives its serialized
  bytes) covering message/field/enum/nested declarations,
- a dynamic message class factory with the generated-code API the
  state clients use: kwargs construction, attribute access with proto3
  defaults, ``SerializeToString`` / ``ParseFromString``,
- the module shims (``descriptor``, ``descriptor_pool``,
  ``runtime_version``, ``symbol_database``, ``internal.builder``)
  that ``StateMessage_pb2`` imports.

:func:`install_protobuf_shim` registers the shims in ``sys.modules``
ONLY when the real ``google.protobuf`` is absent — with protobuf
installed this module is inert. The shim is self-contained (stdlib
only) so it ships by value into Python workers alongside the stateful
processors (memory: spark-plan-quirks).

Wire-format notes implemented here:

- field tag = ``(number << 3) | wire_type``; wire types 0 (varint),
  1 (fixed64), 2 (length-delimited), 5 (fixed32),
- negative int32/int64 encode as 10-byte two's-complement varints,
- proto3 serialization: a field is emitted iff it was explicitly set
  (constructor kwarg / assignment / parsed) — an explicitly-set empty
  nested message still emits a zero-length field, which is what makes
  oneof arms like ``ValueStateCall(exists=Exists())`` distinguishable
  on the JVM side,
- unknown fields are skipped on parse (forward compatibility).
"""

from __future__ import annotations

import struct
import sys
import types

# ---------------------------------------------------------------------------
# wire codec
# ---------------------------------------------------------------------------

_MASK64 = (1 << 64) - 1


def _write_varint(out: bytearray, value: int) -> None:
    value &= _MASK64
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _signed64(value: int) -> int:
    """Interpret a decoded varint as a two's-complement 64-bit int."""
    return value - (1 << 64) if value >= (1 << 63) else value


def _iter_wire_fields(buf):
    """Yield ``(field_number, wire_type, value)`` triples; value is an
    int for varint/fixed and a memoryview slice for length-delimited."""
    view = memoryview(buf)
    pos = 0
    n = len(view)
    while pos < n:
        tag, pos = _read_varint(view, pos)
        num, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _read_varint(view, pos)
        elif wt == 2:
            ln, pos = _read_varint(view, pos)
            if pos + ln > n:
                # a slice would silently clamp and parse the truncated
                # bytes as a shorter valid value; real protobuf raises
                raise ValueError(
                    f"truncated length-delimited field {num}: "
                    f"need {ln} bytes, have {n - pos}"
                )
            val = view[pos : pos + ln]
            pos += ln
        elif wt == 5:
            if pos + 4 > n:
                raise ValueError(f"truncated fixed32 field {num}")
            val = int.from_bytes(view[pos : pos + 4], "little")
            pos += 4
        elif wt == 1:
            if pos + 8 > n:
                raise ValueError(f"truncated fixed64 field {num}")
            val = int.from_bytes(view[pos : pos + 8], "little")
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield num, wt, val


# ---------------------------------------------------------------------------
# descriptor model + FileDescriptorProto parser
# ---------------------------------------------------------------------------

# FieldDescriptorProto.Type values (descriptor.proto)
TYPE_DOUBLE, TYPE_FLOAT = 1, 2
TYPE_INT64, TYPE_UINT64, TYPE_INT32 = 3, 4, 5
TYPE_FIXED64, TYPE_FIXED32 = 6, 7
TYPE_BOOL, TYPE_STRING = 8, 9
TYPE_MESSAGE, TYPE_BYTES = 11, 12
TYPE_UINT32, TYPE_ENUM = 13, 14
TYPE_SINT32, TYPE_SINT64 = 17, 18

LABEL_REPEATED = 3

_VARINT_TYPES = frozenset(
    (TYPE_INT64, TYPE_UINT64, TYPE_INT32, TYPE_UINT32, TYPE_BOOL,
     TYPE_ENUM, TYPE_SINT32, TYPE_SINT64)
)


class FieldDesc:
    __slots__ = ("name", "number", "label", "type", "type_name", "message_type")

    def __init__(self, name, number, label, ftype, type_name):
        self.name = name
        self.number = number
        self.label = label
        self.type = ftype
        self.type_name = type_name  # '.pkg.Message' for message/enum fields
        self.message_type = None  # resolved MessageDesc

    @property
    def repeated(self) -> bool:
        return self.label == LABEL_REPEATED

    def default(self):
        if self.repeated:
            return []
        if self.type in (TYPE_STRING,):
            return ""
        if self.type == TYPE_BYTES:
            return b""
        if self.type == TYPE_BOOL:
            return False
        if self.type in (TYPE_DOUBLE, TYPE_FLOAT):
            return 0.0
        if self.type == TYPE_MESSAGE:
            return None
        return 0


class MessageDesc:
    def __init__(self, name, full_name):
        self.name = name
        self.full_name = full_name
        self.fields = []
        self.fields_by_name = {}
        self.fields_by_number = {}
        # the generated module assigns _serialized_start/_serialized_end
        self._serialized_start = None
        self._serialized_end = None

    def add_field(self, f: FieldDesc) -> None:
        self.fields.append(f)
        self.fields_by_name[f.name] = f
        self.fields_by_number[f.number] = f


class EnumDesc:
    def __init__(self, name, full_name):
        self.name = name
        self.full_name = full_name
        self.values = {}  # name -> number
        self._serialized_start = None
        self._serialized_end = None


class FileDescriptor:
    def __init__(self, name, package):
        self.name = name
        self.package = package
        self.message_types_by_name = {}
        self.enum_types_by_name = {}
        self._loaded_options = None


def _parse_field_descriptor(buf) -> FieldDesc:
    name = ""
    number = label = ftype = 0
    type_name = None
    for num, wt, val in _iter_wire_fields(buf):
        if num == 1:
            name = bytes(val).decode("utf-8")
        elif num == 3:
            number = _signed64(val)
        elif num == 4:
            label = val
        elif num == 5:
            ftype = val
        elif num == 6:
            type_name = bytes(val).decode("utf-8")
    return FieldDesc(name, number, label, ftype, type_name)


def _parse_enum_descriptor(buf, prefix) -> EnumDesc:
    name = ""
    values = []
    for num, wt, val in _iter_wire_fields(buf):
        if num == 1:
            name = bytes(val).decode("utf-8")
        elif num == 2:  # EnumValueDescriptorProto
            vname, vnum = "", 0
            for n2, _w2, v2 in _iter_wire_fields(val):
                if n2 == 1:
                    vname = bytes(v2).decode("utf-8")
                elif n2 == 2:
                    vnum = _signed64(v2)
            values.append((vname, vnum))
    e = EnumDesc(name, f"{prefix}.{name}")
    e.values = dict(values)
    return e


def _parse_message_descriptor(buf, prefix, registry) -> MessageDesc:
    name = ""
    fields = []
    nested = []
    enums = []
    for num, wt, val in _iter_wire_fields(buf):
        if num == 1:
            name = bytes(val).decode("utf-8")
        elif num == 2:
            fields.append(_parse_field_descriptor(val))
        elif num == 3:
            nested.append(val)
        elif num == 4:
            enums.append(val)
        # 8 = oneof_decl: membership is irrelevant here — explicit-set
        # tracking serializes exactly the arm the caller constructed
    full = f"{prefix}.{name}"
    m = MessageDesc(name, full)
    for f in fields:
        m.add_field(f)
    registry[full] = m
    for nb in nested:
        _parse_message_descriptor(nb, full, registry)
    for eb in enums:
        e = _parse_enum_descriptor(eb, full)
        registry[e.full_name] = e
    return m


def parse_file_descriptor(data: bytes):
    """Parse a serialized FileDescriptorProto into (FileDescriptor,
    registry of full_name -> MessageDesc/EnumDesc) with message-type
    references resolved."""
    fname, package = "", ""
    message_bufs, enum_bufs = [], []
    for num, wt, val in _iter_wire_fields(data):
        if num == 1:
            fname = bytes(val).decode("utf-8")
        elif num == 2:
            package = bytes(val).decode("utf-8")
        elif num == 4:
            message_bufs.append(val)
        elif num == 5:
            enum_bufs.append(val)
    fd = FileDescriptor(fname, package)
    registry: dict[str, object] = {}
    prefix = f".{package}" if package else ""
    for mb in message_bufs:
        m = _parse_message_descriptor(mb, prefix, registry)
        fd.message_types_by_name[m.name] = m
    for eb in enum_bufs:
        e = _parse_enum_descriptor(eb, prefix)
        registry[e.full_name] = e
        fd.enum_types_by_name[e.name] = e
    # resolve message-typed fields
    for desc in registry.values():
        if isinstance(desc, MessageDesc):
            for f in desc.fields:
                if f.type == TYPE_MESSAGE and f.type_name:
                    f.message_type = registry[f.type_name]
    return fd, registry


# ---------------------------------------------------------------------------
# dynamic message classes
# ---------------------------------------------------------------------------


class _ShimMessage:
    """Generated-message stand-in: explicit-set field tracking, proto3
    defaults on read, wire-exact SerializeToString/ParseFromString."""

    DESCRIPTOR: MessageDesc = None  # set on subclasses

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        for k, v in kwargs.items():
            if v is None:
                continue
            setattr(self, k, v)

    def __setattr__(self, name, value):
        f = self.DESCRIPTOR.fields_by_name.get(name)
        if f is None:
            raise AttributeError(
                f"{self.DESCRIPTOR.full_name} has no field {name!r}"
            )
        self._values[name] = value

    def __getattr__(self, name):
        # only called when not found normally; _values lookup + defaults
        if name.startswith("_"):
            raise AttributeError(name)
        values = object.__getattribute__(self, "_values")
        if name in values:
            return values[name]
        f = self.DESCRIPTOR.fields_by_name.get(name)
        if f is None:
            raise AttributeError(
                f"{self.DESCRIPTOR.full_name} has no field {name!r}"
            )
        if f.repeated:
            return values.setdefault(name, [])
        if f.type == TYPE_MESSAGE:
            # proto3 read of an unset submessage AUTO-VIVIFIES: the
            # child must be linked to the parent so the generated-code
            # idiom ``msg.ttl.durationMs = x`` lands on the serialized
            # message (the state client sets TTL exactly this way; a
            # throwaway default instance silently dropped it — caught
            # by the end-to-end TTL-expiry test, r12). A vivified child
            # that is never written serializes as ABSENT, matching real
            # protobuf's read-doesn't-mark-presence rule.
            child = _class_for(f.message_type)()
            object.__setattr__(child, "_vivified", True)
            values[name] = child
            return child
        return f.default()

    @staticmethod
    def _is_unwritten_vivified(v) -> bool:
        return (
            isinstance(v, _ShimMessage)
            and getattr(v, "_vivified", False)
            and not v._values
        )

    def HasField(self, name: str) -> bool:
        v = self._values.get(name)
        if v is None:
            return False
        return not self._is_unwritten_vivified(v)

    # -- encode ---------------------------------------------------------
    def SerializeToString(self) -> bytes:
        out = bytearray()
        for f in sorted(self.DESCRIPTOR.fields, key=lambda x: x.number):
            if f.name not in self._values:
                continue
            v = self._values[f.name]
            if not f.repeated and self._is_unwritten_vivified(v):
                continue  # read-only vivification is not presence
            items = v if f.repeated else [v]
            for item in items:
                self._encode_field(out, f, item)
        return bytes(out)

    @staticmethod
    def _encode_field(out: bytearray, f: FieldDesc, v) -> None:
        if f.type in _VARINT_TYPES:
            _write_varint(out, (f.number << 3) | 0)
            if f.type in (TYPE_SINT32, TYPE_SINT64):
                v = (v << 1) ^ (v >> 63)
            elif f.type == TYPE_BOOL:
                v = 1 if v else 0
            _write_varint(out, int(v))
        elif f.type == TYPE_STRING:
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            _write_varint(out, (f.number << 3) | 2)
            _write_varint(out, len(b))
            out += b
        elif f.type == TYPE_BYTES:
            b = bytes(v)
            _write_varint(out, (f.number << 3) | 2)
            _write_varint(out, len(b))
            out += b
        elif f.type == TYPE_MESSAGE:
            b = v.SerializeToString()
            _write_varint(out, (f.number << 3) | 2)
            _write_varint(out, len(b))
            out += b
        elif f.type == TYPE_DOUBLE:
            _write_varint(out, (f.number << 3) | 1)
            out += struct.pack("<d", float(v))
        elif f.type == TYPE_FLOAT:
            _write_varint(out, (f.number << 3) | 5)
            out += struct.pack("<f", float(v))
        elif f.type in (TYPE_FIXED64,):
            _write_varint(out, (f.number << 3) | 1)
            out += int(v).to_bytes(8, "little")
        elif f.type in (TYPE_FIXED32,):
            _write_varint(out, (f.number << 3) | 5)
            out += int(v).to_bytes(4, "little")
        else:
            raise NotImplementedError(f"field type {f.type}")

    # -- decode ---------------------------------------------------------
    def ParseFromString(self, data) -> int:
        object.__setattr__(self, "_values", {})
        desc = self.DESCRIPTOR
        for num, wt, val in _iter_wire_fields(data):
            f = desc.fields_by_number.get(num)
            if f is None:
                continue  # unknown field: skip
            v = self._decode_field(f, wt, val)
            if f.repeated:
                self._values.setdefault(f.name, []).append(v)
            else:
                self._values[f.name] = v
        return len(data)

    @staticmethod
    def _decode_field(f: FieldDesc, wt: int, val):
        if f.type in _VARINT_TYPES:
            v = _signed64(val) if f.type in (TYPE_INT32, TYPE_INT64) else val
            if f.type in (TYPE_SINT32, TYPE_SINT64):
                v = (val >> 1) ^ -(val & 1)
            elif f.type == TYPE_BOOL:
                v = bool(val)
            return v
        if f.type == TYPE_STRING:
            return bytes(val).decode("utf-8")
        if f.type == TYPE_BYTES:
            return bytes(val)
        if f.type == TYPE_MESSAGE:
            m = _class_for(f.message_type)()
            m.ParseFromString(val)
            return m
        if f.type == TYPE_DOUBLE:
            return struct.unpack("<d", int(val).to_bytes(8, "little"))[0]
        if f.type == TYPE_FLOAT:
            return struct.unpack("<f", int(val).to_bytes(4, "little"))[0]
        if f.type in (TYPE_FIXED64, TYPE_FIXED32):
            return val
        raise NotImplementedError(f"field type {f.type}")

    def __repr__(self):
        inner = ", ".join(f"{k}={v!r}" for k, v in self._values.items())
        return f"{self.DESCRIPTOR.name}({inner})"

    def __eq__(self, other):
        return (
            isinstance(other, _ShimMessage)
            and self.DESCRIPTOR is other.DESCRIPTOR
            and self._values == other._values
        )


_CLASS_CACHE: dict[int, type] = {}


def _class_for(desc: MessageDesc) -> type:
    cls = _CLASS_CACHE.get(id(desc))
    if cls is None:
        cls = type(desc.name, (_ShimMessage,), {"DESCRIPTOR": desc})
        _CLASS_CACHE[id(desc)] = cls
    return cls


# ---------------------------------------------------------------------------
# google.protobuf module shims
# ---------------------------------------------------------------------------


class _DescriptorPool:
    def __init__(self):
        self._files = {}

    def AddSerializedFile(self, data: bytes) -> FileDescriptor:
        fd, registry = parse_file_descriptor(data)
        fd._registry = registry
        self._files[fd.name] = fd
        return fd


_DEFAULT_POOL = _DescriptorPool()


def _build_message_and_enum_descriptors(file_desc: FileDescriptor, g: dict):
    """The generated module expects ``_MESSAGENAME`` descriptor globals
    (it assigns ``_serialized_start``/``_serialized_end`` on them)."""
    for full, desc in file_desc._registry.items():
        g[f"_{desc.name.upper()}"] = desc


def _build_top_descriptors_and_messages(
    file_desc: FileDescriptor, module_name: str, g: dict
):
    """Inject message classes and file-level enum value constants, the
    two surfaces generated proto3 modules expose to callers."""
    for name, desc in file_desc.message_types_by_name.items():
        cls = _class_for(desc)
        cls.__module__ = module_name
        g[name] = cls
    for name, edesc in file_desc.enum_types_by_name.items():
        wrapper = types.SimpleNamespace(**edesc.values)
        wrapper.Name = lambda n, _v={v: k for k, v in edesc.values.items()}: _v[n]
        wrapper.Value = lambda n, _d=edesc.values: _d[n]
        g[name] = wrapper
        for vname, vnum in edesc.values.items():
            g[vname] = vnum


def install_protobuf_shim(force: bool = False) -> bool:
    """Register the shim modules in ``sys.modules`` when the real
    ``google.protobuf`` is absent. Returns True when the shim is (or
    already was) installed, False when real protobuf is present.
    Idempotent; safe to call from worker-side processor ``init``."""
    if not force:
        try:
            import google.protobuf.descriptor  # noqa: F401

            return getattr(
                sys.modules["google.protobuf"], "__xda_protoshim__", False
            )
        except ImportError:
            pass
    if "google.protobuf" in sys.modules and getattr(
        sys.modules["google.protobuf"], "__xda_protoshim__", False
    ):
        return True

    def _mod(name):
        m = types.ModuleType(name)
        sys.modules[name] = m
        return m

    google = sys.modules.get("google") or _mod("google")
    if not hasattr(google, "__path__"):
        google.__path__ = []  # namespace-package shape
    pb = _mod("google.protobuf")
    pb.__path__ = []
    pb.__xda_protoshim__ = True
    google.protobuf = pb

    descriptor = _mod("google.protobuf.descriptor")
    descriptor._USE_C_DESCRIPTORS = False
    descriptor.FileDescriptor = FileDescriptor
    descriptor.FieldDescriptor = FieldDesc
    descriptor.Descriptor = MessageDesc
    descriptor.EnumDescriptor = EnumDesc
    pb.descriptor = descriptor

    descriptor_pool = _mod("google.protobuf.descriptor_pool")
    descriptor_pool.Default = lambda: _DEFAULT_POOL
    pb.descriptor_pool = descriptor_pool

    runtime_version = _mod("google.protobuf.runtime_version")
    runtime_version.Domain = types.SimpleNamespace(PUBLIC=1, GOOGLE_INTERNAL=2)
    runtime_version.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    pb.runtime_version = runtime_version

    symbol_database = _mod("google.protobuf.symbol_database")

    class _SymDb:
        def RegisterMessage(self, *a, **k):
            pass

        def RegisterFileDescriptor(self, *a, **k):
            pass

    _sym = _SymDb()
    symbol_database.Default = lambda: _sym
    pb.symbol_database = symbol_database

    internal = _mod("google.protobuf.internal")
    internal.__path__ = []
    pb.internal = internal
    builder = _mod("google.protobuf.internal.builder")
    builder.BuildMessageAndEnumDescriptors = _build_message_and_enum_descriptors
    builder.BuildTopDescriptorsAndMessages = _build_top_descriptors_and_messages
    internal.builder = builder

    # message/message_factory shims occasionally probed by callers
    message_mod = _mod("google.protobuf.message")
    message_mod.Message = _ShimMessage

    class DecodeError(Exception):
        pass

    message_mod.DecodeError = DecodeError
    pb.message = message_mod
    return True
