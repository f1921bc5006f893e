"""Runtime control plane: the UART command protocol, host-side.

The reference controls the FPGA emitter over 115200 8E1 serial: 1-byte
opcodes, multi-byte payloads for taps/time, and a prioritized status-code
stream back (``amaranth_twstft/twstft_config.py:42-129``, decoded by the
gateware FSM ``uart_wrapper.py:96-203``).  This module re-creates the
protocol host-side:

- :class:`StationController` — the ``twstft_config.py`` client API over
  any byte transport (pyserial if present, or any read/write object),
- :class:`EmulatedStation` — a behavioral model of the gateware command
  FSM + status stream, standing in for the FPGA in tests exactly like the
  reference's Amaranth simulator testbenches stand in for hardware
  (SURVEY.md §4.1),
- wire-format helpers shared by both.

Wire format (``twstft_config.py:42-103``):

- plain commands: one opcode byte,
- SET_TAPS_A/B: opcode + ceil(bitlen/8) bytes, little-endian,
- SET_TIME: opcode + 1 byte (seconds % 60),
- status stream: one code byte; CALIBRATION_DONE is followed by the
  PPS-phase byte (``twstft_config.py:113-120``, ``uart_wrapper.py:193-199``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from enum import Enum
from math import ceil
from typing import Callable

from amaranth_twstft_tpu.config import Modulation, TimeCoderMode

__all__ = [
    "SerialInCommand",
    "SerialOutCode",
    "CalibrationMode",
    "encode_command",
    "StationController",
    "EmulatedStation",
    "LoopbackTransport",
    "WireTransport",
    "uart_frame_bits",
    "uart_encode",
    "uart_decode",
    "FdTransport",
    "open_serial",
    "PpsCalibrationBench",
]


class CalibrationMode(Enum):
    """``amaranth_twstft/common.py:136-140``."""

    AUTO = 0
    CLK = 1
    PPS = 2
    OFF = 3


class SerialInCommand(Enum):
    """Host -> FPGA opcodes (``amaranth_twstft/common.py:155-171``)."""

    TIMECODER_OFF = 0
    TIMECODER_INVERT_FIRST_CODE = 1
    SET_TAPS_A = 2
    SET_TAPS_B = 3
    MODE_CARRIER = 4
    MODE_BPSK = 5
    MODE_QPSK = 6
    MODE_OFF = 7
    SET_TIME = 8
    TIMECODER_TIMECODE = 9
    CALIB_OFF = 10
    CALIB_CLK = 11
    CALIB_PPS = 12
    CALIB_AUTO = 13
    ASK_CALIB = 14
    DO_RESET = 15


class SerialOutCode(Enum):
    """FPGA -> host status codes (``amaranth_twstft/common.py:173-187``)."""

    NOTHING = 0
    PPS_GOOD = 1
    PPS_EARLY = 2
    PPS_LATE = 3
    SERIAL_RX_OVERFLOW_ERROR = 4
    SERIAL_RX_FRAME_ERROR = 5
    SERIAL_RX_PARITY_ERROR = 6
    UNKNOWN_COMMAND_ERROR = 7
    CODE_UNALIGNED = 8
    SYMBOL_UNALIGNED = 9
    OSCIL_UNALIGNED = 10
    CALIBRATION_DONE = 12
    LOST_LOCK = 13


def encode_command(cmd: SerialInCommand, payload: int | None = None,
                   bit_len: int = 17) -> bytes:
    """Wire bytes for one command (``twstft_config.py:42-103``)."""
    head = bytes([cmd.value])
    if cmd in (SerialInCommand.SET_TAPS_A, SerialInCommand.SET_TAPS_B):
        if payload is None:
            raise ValueError("taps payload required")
        nbytes = ceil(bit_len / 8)
        return head + int(payload).to_bytes(8, "little")[:nbytes]
    if cmd is SerialInCommand.SET_TIME:
        if payload is None:
            raise ValueError("time payload required")
        return head + bytes([int(payload) % 60])
    return head


class LoopbackTransport:
    """In-memory byte pipe pair (host end + station end)."""

    def __init__(self):
        self._a2b = bytearray()
        self._b2a = bytearray()

    # host side
    def write(self, data: bytes) -> int:
        self._a2b.extend(data)
        return len(data)

    def read(self, n: int = 1) -> bytes:
        out = bytes(self._b2a[:n])
        del self._b2a[:n]
        return out

    def flush(self) -> None:
        pass

    # station side
    def station_read_all(self) -> bytes:
        out = bytes(self._a2b)
        self._a2b.clear()
        return out

    def station_write(self, data: bytes) -> None:
        self._b2a.extend(data)


@dataclass
class EmulatedStation:
    """Behavioral model of the gateware command FSM + status stream.

    State-for-state with ``uart_wrapper.py:96-203``: a WAITING state
    dispatching opcodes, multi-byte receive states for taps/time, status
    emission including the post-calibration PPS phase.
    """

    transport: LoopbackTransport
    bit_len: int = 17
    mode: Modulation = Modulation.OFF
    timecoder: TimeCoderMode = TimeCoderMode.OFF
    calib_mode: CalibrationMode = CalibrationMode.AUTO
    taps_a: int = 0
    taps_b: int = 0
    time_s: int = 0
    pps_phase: int = 3
    calibrated: bool = False
    _state: str = "WAITING"
    _recv_buf: list = field(default_factory=list)
    _recv_need: int = 0

    def step(self) -> None:
        """Consume every pending host byte through the FSM.

        Mid-payload state persists across calls in ``_state``/
        ``_recv_buf`` (the generated multi-byte-receive FSM states of
        ``uart_wrapper.py:97-124``); every read byte is consumed.
        """
        data = self.transport.station_read_all()
        i = 0
        while i < len(data):
            b = data[i]
            if self._state == "WAITING":
                i += self._dispatch(b)
            else:
                self._recv_buf.append(b)
                i += 1
                if len(self._recv_buf) >= self._recv_need:
                    self._finish_recv()

    def _dispatch(self, b: int) -> int:
        try:
            cmd = SerialInCommand(b)
        except ValueError:
            self.transport.station_write(
                bytes([SerialOutCode.UNKNOWN_COMMAND_ERROR.value])
            )
            return 1
        C = SerialInCommand
        if cmd is C.MODE_CARRIER:
            self.mode = Modulation.CARRIER
        elif cmd is C.MODE_BPSK:
            self.mode = Modulation.BPSK
        elif cmd is C.MODE_QPSK:
            self.mode = Modulation.QPSK
        elif cmd is C.MODE_OFF:
            self.mode = Modulation.OFF
        elif cmd is C.TIMECODER_OFF:
            self.timecoder = TimeCoderMode.OFF
        elif cmd is C.TIMECODER_INVERT_FIRST_CODE:
            self.timecoder = TimeCoderMode.INVERT_FIRST_CODE
        elif cmd is C.TIMECODER_TIMECODE:
            self.timecoder = TimeCoderMode.TIMECODE
        elif cmd is C.CALIB_OFF:
            self.calib_mode = CalibrationMode.OFF
        elif cmd is C.CALIB_CLK:
            self.calib_mode = CalibrationMode.CLK
        elif cmd is C.CALIB_PPS:
            self.calib_mode = CalibrationMode.PPS
        elif cmd is C.CALIB_AUTO:
            self.calib_mode = CalibrationMode.AUTO
        elif cmd is C.SET_TAPS_A:
            self._state, self._recv_need = "SET_TAPS_A", ceil(self.bit_len / 8)
        elif cmd is C.SET_TAPS_B:
            self._state, self._recv_need = "SET_TAPS_B", ceil(self.bit_len / 8)
        elif cmd is C.SET_TIME:
            self._state, self._recv_need = "SET_TIME", 1
        elif cmd is C.ASK_CALIB:
            # calibration completes immediately in the model; the gateware
            # sweeps 32 IDELAY taps first (clocking.py:134-191)
            self.calibrated = True
            self.transport.station_write(
                bytes([SerialOutCode.CALIBRATION_DONE.value, self.pps_phase])
            )
        elif cmd is C.DO_RESET:
            self.mode = Modulation.OFF
            self.timecoder = TimeCoderMode.OFF
            self.calibrated = False
        return 1

    def _finish_recv(self) -> None:
        val = int.from_bytes(bytes(self._recv_buf), "little")
        if self._state == "SET_TAPS_A":
            self.taps_a = val
        elif self._state == "SET_TAPS_B":
            self.taps_b = val
        elif self._state == "SET_TIME":
            self.time_s = val % 60
        self._state = "WAITING"
        self._recv_buf = []
        self._recv_need = 0

    def pps_tick(self, good: bool = True) -> None:
        """Emit a PPS quality event (``clocking.py:114-125`` watchdog)."""
        code = SerialOutCode.PPS_GOOD if good else SerialOutCode.PPS_LATE
        self.transport.station_write(bytes([code.value]))


class FdTransport:
    """Byte transport over an OS file descriptor (a real tty device).

    The reference host client is pyserial at 115200 8E1
    (``twstft_config.py:131-134``); this stdlib equivalent opens the
    device node directly and configures the line with ``termios`` so the
    control CLI works without pyserial.  Non-blocking reads: ``read``
    returns the bytes available (up to ``n``), empty when none — the
    same contract ``StationController.monitor`` expects.
    """

    def __init__(self, port: str | int, baud: int = 115200,
                 parity: str = "E"):
        import os as _os

        if isinstance(port, int):
            self.fd = port
        else:
            self.fd = _os.open(port, _os.O_RDWR | _os.O_NOCTTY
                               | _os.O_NONBLOCK)
        self._configure(baud, parity)

    def _configure(self, baud: int, parity: str) -> None:
        import termios

        try:
            attrs = termios.tcgetattr(self.fd)
        except termios.error:
            return  # not a tty (tests may pass a pipe)
        iflag, oflag, cflag, lflag, ispeed, ospeed, cc = attrs
        # raw 8-bit line, reference parity 8E1 (twstft_config.py:133)
        iflag = termios.INPCK if parity != "N" else 0
        oflag = 0
        lflag = 0
        cflag = termios.CREAD | termios.CLOCAL | termios.CS8
        if parity == "E":
            cflag |= termios.PARENB
        elif parity == "O":
            cflag |= termios.PARENB | termios.PARODD
        rate = getattr(termios, f"B{baud}", termios.B115200)
        cc = list(cc)
        cc[termios.VMIN] = 0
        cc[termios.VTIME] = 0
        termios.tcsetattr(
            self.fd, termios.TCSANOW,
            [iflag, oflag, cflag, lflag, rate, rate, cc],
        )

    def write(self, data: bytes) -> int:
        import os as _os

        return _os.write(self.fd, data)

    def read(self, n: int = 1) -> bytes:
        import os as _os

        try:
            return _os.read(self.fd, n)
        except BlockingIOError:
            return b""

    def flush(self) -> None:
        pass

    def close(self) -> None:
        import os as _os

        _os.close(self.fd)


def open_serial(port: str, baud: int = 115200, parity: str = "E"):
    """Open the station control link: pyserial when installed, the
    stdlib :class:`FdTransport` otherwise (same read/write contract)."""
    try:
        import serial  # type: ignore

        return serial.Serial(port, baud, parity=parity, timeout=0)
    except ImportError:
        return FdTransport(port, baud, parity)


Handler = Callable[["StationController", SerialOutCode], None]


class StationController:
    """Host client API (the ``twstft_config.py`` functions, object-form)."""

    def __init__(self, transport, bit_len: int = 17,
                 station: EmulatedStation | None = None):
        self.t = transport
        self.bit_len = bit_len
        self._station = station  # emulation: step after writes

    def _send(self, cmd: SerialInCommand, payload: int | None = None) -> None:
        self.t.write(encode_command(cmd, payload, self.bit_len))
        if hasattr(self.t, "flush"):
            self.t.flush()
        if self._station is not None:
            self._station.step()

    def set_mode(self, mode: Modulation) -> None:
        self._send(
            {
                Modulation.CARRIER: SerialInCommand.MODE_CARRIER,
                Modulation.BPSK: SerialInCommand.MODE_BPSK,
                Modulation.QPSK: SerialInCommand.MODE_QPSK,
                Modulation.OFF: SerialInCommand.MODE_OFF,
            }[mode]
        )

    def set_timecode_mode(self, mode: TimeCoderMode) -> None:
        self._send(
            {
                TimeCoderMode.OFF: SerialInCommand.TIMECODER_OFF,
                TimeCoderMode.INVERT_FIRST_CODE:
                    SerialInCommand.TIMECODER_INVERT_FIRST_CODE,
                TimeCoderMode.TIMECODE: SerialInCommand.TIMECODER_TIMECODE,
            }[mode]
        )

    def set_calib_mode(self, mode: CalibrationMode) -> None:
        self._send(
            {
                CalibrationMode.OFF: SerialInCommand.CALIB_OFF,
                CalibrationMode.CLK: SerialInCommand.CALIB_CLK,
                CalibrationMode.PPS: SerialInCommand.CALIB_PPS,
                CalibrationMode.AUTO: SerialInCommand.CALIB_AUTO,
            }[mode]
        )

    def set_taps(self, taps_a: int | None = None, taps_b: int | None = None):
        if taps_a is not None:
            self._send(SerialInCommand.SET_TAPS_A, taps_a)
        if taps_b is not None:
            self._send(SerialInCommand.SET_TAPS_B, taps_b)

    def set_time(self, seconds: int) -> None:
        self._send(SerialInCommand.SET_TIME, seconds)

    def reset(self) -> None:
        self._send(SerialInCommand.DO_RESET)

    def read_byte(self, timeout_s: float | None = None) -> bytes:
        """One byte from the transport, or ``b""`` on timeout.

        The reference's pyserial is BLOCKING (``new_serial`` sets no
        timeout, ``twstft_config.py:131-134``); this module's transports
        are non-blocking (``FdTransport`` VMIN=0, ``open_serial``
        timeout=0), so waiting reads must poll.  ``timeout_s=None`` is a
        single non-blocking attempt (the emulated-station fast path).
        Also the helper CALIBRATION_DONE handlers use to consume the
        PPS-phase payload byte (the reference's ``print_code`` reads it
        inside the handler, ``twstft_config.py:108-114``).
        """
        deadline = (
            None if timeout_s is None else time.monotonic() + timeout_s
        )
        while True:
            b = self.t.read(1)
            if b or deadline is None or time.monotonic() >= deadline:
                return b
            time.sleep(0.002)

    def ask_calib(self, timeout_s: float = 5.0) -> int:
        """Returns the PPS phase (``twstft_config.py:100-103``).

        Polls up to ``timeout_s`` for CALIBRATION_DONE (the gateware
        sweeps 32 IDELAY taps first) and then for the phase payload byte
        (a separate UART frame ~87 us later at 115200 baud).
        """
        self._send(SerialInCommand.ASK_CALIB)
        deadline = time.monotonic() + timeout_s
        while True:
            b = self.read_byte(max(deadline - time.monotonic(), 0.0))
            if not b:
                raise TimeoutError("no CALIBRATION_DONE received")
            if b[0] == SerialOutCode.CALIBRATION_DONE.value:
                p = self.read_byte(max(deadline - time.monotonic(), 0.01))
                if not p:
                    raise TimeoutError("no PPS-phase payload byte")
                return p[0]

    def set_time_on_pps(self, get_time: Callable[[], int],
                        settle_s: float = 0.0,
                        timeout_s: float = 2.5) -> None:
        """PPS-synchronized time setting: wait for PPS_GOOD, settle, then
        send the *next* second (``twstft_config.py:203-217``).  PPS_GOOD
        arrives at most once per second, so the poll deadline defaults
        past two PPS periods."""
        deadline = time.monotonic() + timeout_s
        while True:
            b = self.read_byte(max(deadline - time.monotonic(), 0.0))
            if not b:
                raise TimeoutError("no PPS_GOOD received")
            if b[0] == SerialOutCode.PPS_GOOD.value:
                if settle_s:
                    time.sleep(settle_s)
                self.set_time(get_time() + 1)
                return

    def monitor(self, handlers: dict[SerialOutCode, list[Handler]],
                max_events: int | None = None,
                idle_timeout_s: float | None = None) -> int:
        """Blocking dispatch loop (``twstft_config.py:116-129``).

        Returns the number of events dispatched (bounded by
        ``max_events`` for testability; the reference loops forever;
        ``idle_timeout_s`` keeps polling the non-blocking transports
        that long between events).

        Like the reference, CALIBRATION_DONE handlers must consume the
        PPS-phase payload byte themselves via :meth:`read_byte`
        (``print_code`` does exactly that, ``twstft_config.py:108-114``)
        — otherwise the payload is decoded as the next status code.
        """
        n = 0
        while max_events is None or n < max_events:
            b = self.read_byte(idle_timeout_s)
            if not b:
                break
            try:
                code = SerialOutCode(b[0])
            except ValueError:
                continue
            for h in handlers.get(code, []):
                h(self, code)
            n += 1
        return n


@dataclass
class PpsCalibrationBench:
    """Emulated PPS-metastability calibration bench.

    The reference drives a synthesizer's 10 MHz phase and a scope over
    VXI-11, reading back the FPGA's reported PPS offsets and counting
    PPS_EARLY "double jumps" near the metastable sampling window
    (``experiments/250103_PPS_calibration/calibration.py:16-100``); the
    gateware counterpart is the IDELAY auto-calibration FSM parking the
    PPS sample away from the metastable edge (``clocking.py:134-191``).

    This bench emulates the physics: the 280 MHz sync clock divides the
    10 MHz period into ``cycles`` = 28 sampling positions
    (``clocking.py:193-204``); sweeping the reference phase walks the PPS
    across them, and within ``metastable_deg`` of a cycle boundary the
    sampled phase resolves randomly to either neighbor — the double-jump
    signature the lab bench quantifies.
    """

    station: EmulatedStation
    controller: StationController
    cycles: int = 28  # 280 MHz / 10 MHz
    metastable_deg: float = 1.5  # half-width of the unstable zone
    seed: int = 0

    def sample_phase(self, phase_deg: float, rng) -> tuple[int, bool]:
        """(pps_phase, metastable?) at one reference phase setting."""
        pos = (phase_deg % 360.0) / 360.0 * self.cycles
        lo = int(pos) % self.cycles
        deg_per_cycle = 360.0 / self.cycles
        dist_deg = min(pos - int(pos), 1.0 - (pos - int(pos))) * deg_per_cycle
        meta = dist_deg < self.metastable_deg
        if meta and rng.random() < 0.5:
            # resolves to the neighboring cycle: the "double jump"
            near_upper = (pos - int(pos)) > 0.5
            lo = (lo + (1 if near_upper else -1)) % self.cycles
        return lo, meta

    def sweep(self, phases_deg, repeats: int = 5):
        """Sweep the 10 MHz phase; per point, calibrate ``repeats`` times.

        Returns rows ``(phase_deg, median_pps_phase, n_distinct,
        early_events)`` — ``n_distinct > 1`` marks the metastable zones
        (the bench's double-jump detection, ``calibration.py:72-89``).
        """
        import numpy as _np

        rng = _np.random.default_rng(self.seed)
        rows = []
        for ph in phases_deg:
            vals = []
            early = 0
            for _ in range(repeats):
                v, meta = self.sample_phase(ph, rng)
                self.station.pps_phase = v
                got = self.controller.ask_calib()
                vals.append(got)
                if meta:
                    self.station.transport.station_write(
                        bytes([SerialOutCode.PPS_EARLY.value])
                    )
                    early += 1
            rows.append(
                (float(ph), float(_np.median(vals)), len(set(vals)), early)
            )
        return rows


# ----------------------------------------------------------------------
# 8E1 line-level framing — the vendored serial core's wire format
# (``amaranth_serial.py``: frame = start(0), 8 data bits LSB-first,
# even-parity bit, stop(1); err.frame = not(start==0 and stop==1),
# err.parity separately, :209-245).  This is the software model of the
# bit stream the reference's AsyncSerial shifts, so the control protocol
# can be exercised down to the line level without hardware.
# ----------------------------------------------------------------------
def _parity_bit(byte: int, parity: str) -> int | None:
    ones = bin(byte & 0xFF).count("1")
    if parity == "E":
        return ones & 1  # even total: bit = popcount mod 2
    if parity == "O":
        return (ones & 1) ^ 1
    return None  # "N"


def uart_frame_bits(byte: int, parity: str = "E") -> list[int]:
    """One byte -> line bits [start, d0..d7 (LSB first), parity?, stop]."""
    bits = [0] + [(byte >> i) & 1 for i in range(8)]
    p = _parity_bit(byte, parity)
    if p is not None:
        bits.append(p)
    bits.append(1)
    return bits


def uart_encode(
    data: bytes, parity: str = "E", oversample: int = 1, idle_bits: int = 1
) -> "list[int]":
    """Bytes -> line-level bit stream (1 = idle/high).

    ``oversample`` repeats each bit (the receiver's divisor view);
    ``idle_bits`` high bits between frames and at both ends.
    """
    out = [1] * idle_bits * oversample
    for b in data:
        for bit in uart_frame_bits(b, parity):
            out.extend([bit] * oversample)
        out.extend([1] * idle_bits * oversample)
    return out


def uart_decode(
    bits, parity: str = "E", oversample: int = 1
) -> tuple[bytes, list[dict]]:
    """Line bits -> (bytes, error records) — the AsyncSerial RX model.

    Hunts for the idle->start falling edge, samples each bit at its
    midpoint, checks start/stop (``err.frame``) and the parity bit
    (``err.parity``) exactly like the vendored core
    (``amaranth_serial.py:240-245``); errored frames are dropped from
    the byte stream but recorded as ``{"at": bit_index, "frame": bool,
    "parity": bool}``.
    """
    bits = list(bits)
    n_frame = 10 + (0 if parity == "N" else 1)
    out = bytearray()
    errors: list[dict] = []
    i = 0
    n = len(bits)
    # require one idle sample before a start edge (resync after noise)
    prev_high = True
    while i + n_frame * oversample <= n:
        if not (prev_high and bits[i] == 0):
            prev_high = bits[i] == 1
            i += 1
            continue
        # sample midpoints of the frame starting at i
        samples = [
            bits[i + k * oversample + oversample // 2]
            for k in range(n_frame)
        ]
        start, stop = samples[0], samples[-1]
        data = sum(samples[1 + k] << k for k in range(8))
        frame_err = not (start == 0 and stop == 1)
        parity_err = False
        if parity != "N":
            parity_err = samples[9] != _parity_bit(data, parity)
        if frame_err or parity_err:
            errors.append(
                {"at": i, "frame": frame_err, "parity": parity_err}
            )
        else:
            out.append(data)
        i += n_frame * oversample
        prev_high = True
    return bytes(out), errors


class WireTransport(LoopbackTransport):
    """A loopback transport whose two directions pass through the 8E1
    BIT STREAM: every write is framed to line bits and deframed at the
    far end (and vice versa), so protocol tests exercise the vendored
    serial core's wire format, not just a byte queue.

    ``corrupt_next_bit`` flips one data-region bit of the next encoded
    frame (fault injection: the deframer must drop that frame and log a
    parity error, which the station side surfaces like the reference's
    ``err.parity``)."""

    def __init__(self, parity: str = "E", oversample: int = 4):
        super().__init__()
        self.parity = parity
        self.oversample = oversample
        self.line_errors: list[dict] = []
        self.bits_on_wire = 0
        self.corrupt_next_bit = False

    def _through_wire(self, data: bytes) -> bytes:
        bits = uart_encode(data, self.parity, self.oversample)
        if self.corrupt_next_bit and data:
            self.corrupt_next_bit = False
            # flip every sample of data bit d3 of the first frame:
            # idle(1) + start(1) + d0..d2(3) samples precede it
            base = (1 + 1 + 3) * self.oversample
            for k in range(self.oversample):
                bits[base + k] ^= 1
        self.bits_on_wire += len(bits)
        out, errs = uart_decode(bits, self.parity, self.oversample)
        self.line_errors.extend(errs)
        return out

    def write(self, data: bytes) -> int:  # host -> station
        self._a2b.extend(self._through_wire(bytes(data)))
        return len(data)

    def station_write(self, data: bytes) -> None:  # station -> host
        self._b2a.extend(self._through_wire(bytes(data)))
