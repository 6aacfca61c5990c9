"""DuckDB oracles for plans/reference_parity.py — reading the same
reference CSVs with explicit columns; all comparisons integer-exact."""

from __future__ import annotations

from .reference_parity import (
    AD_SLIDE_S,
    AD_WINDOW_S,
    BLACKLIST_CAP,
    LOGIN_GAP_S,
    ORDER_TIMEOUT_S,
    RECEIPT_HI_S,
    RECEIPT_LO_S,
    REFERENCE_INPUT,
    TZ_OFFSET_S,
)

_AD = (
    f"read_csv('{REFERENCE_INPUT}/AdClickLog.csv', header=false, columns="
    "{'user_id':'BIGINT','ad_id':'BIGINT','province':'VARCHAR','city':'VARCHAR','ts':'BIGINT'})"
)
_LOGIN = (
    f"read_csv('{REFERENCE_INPUT}/LoginLog.csv', header=false, columns="
    "{'user_id':'BIGINT','ip':'VARCHAR','event_type':'VARCHAR','ts':'BIGINT'})"
)
_ORDER = (
    f"read_csv('{REFERENCE_INPUT}/OrderLog.csv', header=false, columns="
    "{'order_id':'BIGINT','event_type':'VARCHAR','tx_id':'VARCHAR','ts':'BIGINT'})"
)
_RECEIPT = (
    f"read_csv('{REFERENCE_INPUT}/ReceiptLog.csv', header=false, columns="
    "{'tx_id':'VARCHAR','pay_channel':'VARCHAR','ts':'BIGINT'})"
)

REF_AD_CLICK_BY_PROVINCE = f"""
SELECT (ts - ts % {AD_SLIDE_S}) + j * {AD_SLIDE_S} AS window_end_s, province, count(*) AS cnt
FROM {_AD}, generate_series(1, {AD_WINDOW_S // AD_SLIDE_S}) AS gs(j)
GROUP BY 1, 2
"""

REF_AD_CLICK_BLACKLIST = f"""
SELECT user_id, ad_id, (ts + {TZ_OFFSET_S}) // 86400 AS day_idx, count(*) AS click_cnt
FROM {_AD}
GROUP BY 1, 2, 3
HAVING count(*) >= {BLACKLIST_CAP}
"""

REF_AD_CLICKS_FILTERED = f"""
WITH clicks AS (
  SELECT user_id, ad_id, province, city, ts, (ts + {TZ_OFFSET_S}) // 86400 AS day_idx FROM {_AD}
), bl AS (
  SELECT user_id, ad_id, day_idx FROM clicks GROUP BY 1, 2, 3 HAVING count(*) >= {BLACKLIST_CAP}
)
SELECT c.user_id, c.ad_id, c.province, c.city, c.ts
FROM clicks c ANTI JOIN bl ON c.user_id = bl.user_id AND c.ad_id = bl.ad_id AND c.day_idx = bl.day_idx
"""

REF_LOGIN_FAIL = f"""
WITH seq AS (
  SELECT user_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, ip) AS prev_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, ip) AS prev_ts
  FROM {_LOGIN}
)
SELECT user_id, prev_ts AS first_fail_ts, ts AS second_fail_ts
FROM seq
WHERE event_type = 'fail' AND prev_type = 'fail' AND ts - prev_ts <= {LOGIN_GAP_S}
"""

REF_ORDER_TIMEOUT = f"""
WITH o AS (SELECT order_id, event_type, ts FROM {_ORDER}),
c AS (SELECT order_id, ts AS create_ts FROM o WHERE event_type = 'create'),
p AS (SELECT order_id AS p_order, ts AS pay_ts FROM o WHERE event_type = 'pay')
SELECT coalesce(order_id, p_order) AS order_id, create_ts, pay_ts,
       CASE WHEN pay_ts IS NULL THEN 'timeout'
            WHEN create_ts IS NULL THEN 'payed but no create'
            WHEN pay_ts - create_ts <= {ORDER_TIMEOUT_S} THEN 'payed'
            ELSE 'payed timeout' END AS status
FROM c FULL OUTER JOIN p ON c.order_id = p.p_order
"""

REF_ORDER_RECEIPT_JOIN = f"""
SELECT o.tx_id, o.order_id, o.ts AS pay_ts, r.pay_channel, r.ts AS receipt_ts
FROM {_ORDER} o
JOIN {_RECEIPT} r
  ON o.tx_id = r.tx_id
 AND r.ts >= o.ts - {RECEIPT_LO_S} AND r.ts <= o.ts + {RECEIPT_HI_S}
WHERE o.event_type = 'pay' AND coalesce(o.tx_id, '') <> ''
"""

REF_ORDER_RECEIPT_RECONCILE = f"""
WITH pays AS (
  SELECT tx_id, ts AS pay_ts FROM {_ORDER} WHERE event_type = 'pay' AND coalesce(tx_id, '') <> ''
), receipts AS (
  SELECT tx_id, ts AS receipt_ts FROM {_RECEIPT}
), matched AS (
  SELECT p.tx_id, p.pay_ts, r.receipt_ts
  FROM pays p JOIN receipts r
    ON p.tx_id = r.tx_id AND r.receipt_ts >= p.pay_ts - {RECEIPT_LO_S} AND r.receipt_ts <= p.pay_ts + {RECEIPT_HI_S}
)
SELECT tx_id, pay_ts, receipt_ts, 'matched' AS tag FROM matched
UNION ALL
SELECT p.tx_id, p.pay_ts, CAST(NULL AS BIGINT), 'payButNoReceipt'
FROM pays p ANTI JOIN matched m ON p.tx_id = m.tx_id
UNION ALL
SELECT r.tx_id, CAST(NULL AS BIGINT), r.receipt_ts, 'receiptButNoPay'
FROM receipts r ANTI JOIN matched m ON r.tx_id = m.tx_id
"""

REFERENCE_ORACLES: dict[str, str] = {
    "ref_ad_click_by_province": REF_AD_CLICK_BY_PROVINCE,
    "ref_ad_click_blacklist": REF_AD_CLICK_BLACKLIST,
    "ref_ad_clicks_filtered": REF_AD_CLICKS_FILTERED,
    "ref_login_fail": REF_LOGIN_FAIL,
    "ref_order_timeout": REF_ORDER_TIMEOUT,
    "ref_order_receipt_join": REF_ORDER_RECEIPT_JOIN,
    "ref_order_receipt_reconcile": REF_ORDER_RECEIPT_RECONCILE,
}
