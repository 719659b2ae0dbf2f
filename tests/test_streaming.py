"""Streaming wiretap tests (SURVEY.md §5.2 #3): availableNow triggers over
a temp dir, file "rollover" = appending new files (S6), dynamic
subscription registration between micro-batch runs (ST2), per-subscriber
delivered sets (ST3)."""

import os

from hadoop_stuff_spark.streaming.tail import tail_stream
from hadoop_stuff_spark.streaming.wiretap import (
    parse_subscription,
    start_wiretap,
    subscriptions_df,
)


class CollectingSink:
    """Test double for the TCP sink: records per-(host,port) deliveries."""

    def __init__(self):
        self.delivered: dict[tuple[str, int], list[str]] = {}

    def __call__(self, host: str, port: int, records: list[str]) -> None:
        self.delivered.setdefault((host, port), []).extend(records)


def _write_log(directory: str, name: str, lines: list[str]) -> None:
    with open(os.path.join(directory, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_parse_subscription_reference_grammar():
    sub = parse_subscription(".*126\\.247\\.0\\.97.* 10.0.0.5:5555", sub_id=9)
    assert sub == {
        "sub_id": 9,
        "regex": ".*126\\.247\\.0\\.97.*",
        "host": "10.0.0.5",
        "port": 5555,
    }


def test_wiretap_routing_and_dynamic_registration(spark, tmp_path):
    logdir = str(tmp_path / "logs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(logdir)

    _write_log(
        logdir,
        "cdr.0.txt",
        [
            "CALL from=17325551212 ip=126.247.0.97 status=OK",
            "CALL from=17325551300 ip=10.1.2.3 status=DROP",
            "FLOW proto=7 src=156.56.0.124 dst=156.56.0.125",
        ],
    )

    subs_rows = [
        {"sub_id": 1, "regex": "126\\.247\\.0\\.97", "host": "h1", "port": 1},
        {"sub_id": 2, "regex": "status=DROP", "host": "h2", "port": 2},
    ]
    sink = CollectingSink()
    stream = tail_stream(spark, logdir)

    q = start_wiretap(
        stream,
        get_subscriptions=lambda s: subscriptions_df(s, subs_rows),
        deliver=sink,
        checkpoint_dir=ckpt,
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    assert [r for r in sink.delivered[("h1", 1)]] == [
        "CALL from=17325551212 ip=126.247.0.97 status=OK"
    ]
    assert sink.delivered[("h2", 2)] == ["CALL from=17325551300 ip=10.1.2.3 status=DROP"]

    # --- rollover (new file) + dynamic registration before the next run:
    # a FLOW subscriber appears; only NEW records are processed (checkpoint),
    # and the new subscription takes effect at the next micro-batch.
    subs_rows.append({"sub_id": 3, "regex": "^FLOW", "host": "h3", "port": 3})
    _write_log(
        logdir,
        "cdr.1.txt",
        [
            "FLOW proto=6 src=1.2.3.4 dst=5.6.7.8",
            "CALL from=17325551400 ip=126.247.0.97 status=OK",
        ],
    )
    sink2 = CollectingSink()
    q2 = start_wiretap(
        tail_stream(spark, logdir),
        get_subscriptions=lambda s: subscriptions_df(s, subs_rows),
        deliver=sink2,
        checkpoint_dir=ckpt,
        trigger_available_now=True,
    )
    q2.awaitTermination(120)

    # old file NOT re-delivered (checkpoint state), new records routed,
    # including to the dynamically added subscriber
    assert sink2.delivered[("h3", 3)] == ["FLOW proto=6 src=1.2.3.4 dst=5.6.7.8"]
    assert sink2.delivered[("h1", 1)] == [
        "CALL from=17325551400 ip=126.247.0.97 status=OK"
    ]
    assert ("h2", 2) not in sink2.delivered


def test_multicast_one_record_many_subscribers(spark, tmp_path):
    logdir = str(tmp_path / "logs")
    os.makedirs(logdir)
    _write_log(logdir, "a.txt", ["ALPHA BETA GAMMA"])
    sink = CollectingSink()
    rows = [
        {"sub_id": 1, "regex": "ALPHA", "host": "s1", "port": 1},
        {"sub_id": 2, "regex": "GAMMA", "host": "s2", "port": 2},
        {"sub_id": 3, "regex": "NOPE", "host": "s3", "port": 3},
    ]
    q = start_wiretap(
        tail_stream(spark, logdir),
        get_subscriptions=lambda s: subscriptions_df(s, rows),
        deliver=sink,
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    assert sink.delivered[("s1", 1)] == ["ALPHA BETA GAMMA"]
    assert sink.delivered[("s2", 2)] == ["ALPHA BETA GAMMA"]
    assert ("s3", 3) not in sink.delivered


def test_real_tcp_delivery_and_dead_subscriber_drop(spark, tmp_path):
    """S7 with a REAL TCP socket + ST4 drop-and-warn: live subscriber gets
    its records over the wire; the dead one is dropped without failing the
    stream, with drops tallied."""
    import socket
    import socketserver
    import threading

    received: list[str] = []

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for line in self.rfile:
                received.append(line.decode("utf-8").rstrip("\n"))

    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    live_port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    # a port that is certainly closed: bind-then-close
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    dead_port = probe.getsockname()[1]
    probe.close()

    logdir = str(tmp_path / "logs")
    os.makedirs(logdir)
    _write_log(logdir, "a.txt", ["CALL alpha", "FLOW beta", "CALL gamma"])

    subs = [
        {"sub_id": 1, "regex": "^CALL", "host": "127.0.0.1", "port": live_port},
        {"sub_id": 2, "regex": "FLOW", "host": "127.0.0.1", "port": dead_port},
    ]
    drops: dict = {}
    try:
        q = start_wiretap(
            tail_stream(spark, logdir),
            get_subscriptions=lambda s: subscriptions_df(s, subs),
            deliver=None,  # the real TcpSink
            trigger_available_now=True,
            drop_stats=drops,
        )
        q.awaitTermination(120)
    finally:
        server.shutdown()
        server.server_close()

    assert sorted(received) == ["CALL alpha", "CALL gamma"]
    assert drops == {("127.0.0.1", dead_port): 1}
