"""Broadcast-constant lookup tables (SURVEY.md §2.4 J1/J3).

Small dicts the reference keeps as package-level Go maps; here they are
module-level constants that pickle with the batch functions — each worker
gets one copy, never re-shipped per batch.
"""

# charset → language (/root/reference/lang.go:27-38)
CHARSET_LANG_MAP = {
    "GBK": "zh",
    "Big5": "zh",
    "ISO-2022-CN": "zh",
    "SHIFT_JIS": "ja",
    "KOI8-R": "ru",
    "EUC-JP": "ja",
    "EUC-KR": "ko",
    "EUC-CN": "zh",
    "ISO-2022-JP": "ja",
    "ISO-2022-KR": "ko",
}

# /root/reference/lang.go:40-74
LANG_EN_ZH_MAP = {
    "zh": "中文", "en": "英语", "ja": "日语", "ru": "俄语", "ko": "韩语",
    "ar": "阿拉伯语", "hi": "印地语", "de": "德语", "fr": "法语",
    "es": "西班牙语", "pt": "葡萄牙语", "it": "意大利语", "th": "泰语",
    "vi": "越南语", "my": "缅甸语",
}
LANG_ZH_EN_MAP = {v: k for k, v in LANG_EN_ZH_MAP.items()}

# ICP province-abbreviation → province (/root/reference/extract/icp.go:12-53)
PROVINCE_SHORT_MAP = {
    "京": "北京", "津": "天津", "沪": "上海", "渝": "重庆", "黑": "黑龙江",
    "吉": "吉林", "辽": "辽宁", "冀": "河北", "豫": "河南", "鲁": "山东",
    "晋": "山西", "陕": "陕西", "秦": "陕西", "蒙": "内蒙古", "宁": "宁夏",
    "陇": "甘肃", "甘": "甘肃", "新": "新疆", "青": "青海", "藏": "西藏",
    "鄂": "湖北", "皖": "安徽", "苏": "江苏", "浙": "浙江", "闽": "福建",
    "湘": "湖南", "赣": "江西", "川": "四川", "蜀": "四川", "黔": "贵州",
    "贵": "贵州", "滇": "云南", "云": "云南", "粤": "广东", "桂": "广西",
    "琼": "海南", "港": "中国香港", "澳": "中国澳门", "台": "中国台湾",
}

# gov.<cc> → country (/root/reference/extract/meta.go:7-72)
HOST_GOV_COUNTRY_MAP = {
    "hk": "中国", "tw": "中国", "mo": "中国", "jp": "日本", "kr": "韩国",
    "in": "印度", "uk": "英国", "us": "美国", "it": "意大利", "es": "西班牙",
    "ru": "俄罗斯", "de": "德国", "fr": "法国", "th": "泰国", "vn": "越南",
    "sg": "新加坡", "au": "澳大利亚", "ca": "加拿大", "il": "以色列",
    "mm": "缅甸", "dz": "阿尔及利亚", "pl": "波兰", "az": "南非",
    "ng": "尼日利亚", "kp": "朝鲜", "lb": "黎巴嫩", "ua": "乌克兰",
    "tr": "土耳其", "se": "瑞典", "lk": "斯里兰卡", "si": "斯洛文尼亚",
    "sk": "斯洛伐克", "ro": "罗马尼亚", "pt": "葡萄牙", "ph": "菲律宾",
    "pk": "巴基斯坦", "py": "巴拉圭", "np": "尼泊尔", "ma": "摩洛哥",
    "my": "马来西亚", "lt": "立陶宛", "ie": "爱尔兰", "iq": "伊拉克",
    "ir": "伊朗", "id": "印度尼西亚", "hu": "匈牙利", "gr": "希腊",
    "eg": "埃及", "cz": "捷克", "hr": "克罗地亚", "co": "哥伦比亚",
    "cl": "智利", "br": "巴西", "bg": "保加利亚", "be": "比利时",
    "bd": "孟加拉国", "aw": "阿鲁巴", "am": "亚美尼亚", "ai": "安圭拉",
    "ao": "安哥拉", "al": "阿尔巴尼亚", "af": "阿富汗", "sa": "沙特阿拉伯",
    "nl": "荷兰",
}

# word-split languages for keep/drop word counting (/root/reference/extract/link.go:29)
WORD_LANGS = frozenset({"en", "ru", "ar", "de", "fr", "es", "pt"})

# zh punctuation rescue set (/root/reference/extract/link.go:27)
ZH_PUNCS = ("，", "。", "；", "：", "？", "！", "（", "）", "“", "”")

# short English titles treated as list-page links in zh context (link.go:31)
ZH_EN_TITLES = frozenset({"nba", "cba", "5g", "ai", "it", "ipo"})

# codec allowlist — the content-type allowlist analog
# (/root/reference/http.go:20-29); rows with other codecs are dropped at the
# read via a pushdown predicate.
CODEC_ALLOWLIST = ("pcm_s16le", "flac", "opus", "mp3", "aac", "vorbis")
