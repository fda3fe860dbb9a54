"""Tiny embedded per-language seed corpora.

Used three ways, all deterministic:
  * the synthetic ``pages`` generator samples words from them;
  * the character-trigram language-ID model is trained on them;
  * the character-bigram perplexity model is trained on them.

This mirrors the reference's offline-built lookup caches (cache.yml filter
tables, reference metadata.py:121-244): model state is data shipped to
executors via broadcast, never fetched at runtime.

The sentences are ordinary public-domain-style prose written for this repo.
"""

from __future__ import annotations

CORPORA: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and runs into the quiet "
        "forest where the old river bends toward the small village people in "
        "the town gather at the market every morning to buy bread and fruit "
        "while children play near the stone bridge that was built many years "
        "ago by workers from the valley the weather in this region is mild "
        "and the fields are green for most of the year travelers often stop "
        "here to rest and enjoy the view of the mountains in the distance"
    ),
    "fr": (
        "le renard brun saute par dessus le chien et court dans la forêt "
        "tranquille où la vieille rivière tourne vers le petit village les "
        "gens de la ville se réunissent au marché chaque matin pour acheter "
        "du pain et des fruits pendant que les enfants jouent près du pont "
        "de pierre qui a été construit il y a longtemps par des ouvriers de "
        "la vallée le climat de cette région est doux et les champs restent "
        "verts presque toute la année les voyageurs aiment se reposer ici"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und läuft in "
        "den stillen wald wo der alte fluss sich zum kleinen dorf wendet die "
        "menschen der stadt treffen sich jeden morgen auf dem markt um brot "
        "und obst zu kaufen während die kinder an der steinernen brücke "
        "spielen die vor vielen jahren von arbeitern aus dem tal gebaut "
        "wurde das wetter in dieser gegend ist mild und die felder sind fast "
        "das ganze jahr grün reisende machen hier gern eine kurze rast"
    ),
    "es": (
        "el zorro marrón salta sobre el perro perezoso y corre hacia el "
        "bosque tranquilo donde el viejo río gira hacia el pequeño pueblo la "
        "gente de la ciudad se reúne en el mercado cada mañana para comprar "
        "pan y fruta mientras los niños juegan cerca del puente de piedra "
        "que fue construido hace muchos años por trabajadores del valle el "
        "clima de esta región es suave y los campos permanecen verdes casi "
        "todo el año los viajeros suelen descansar aquí y mirar las montañas"
    ),
    "zh": (
        "那只敏捷的棕色狐狸跳过懒狗跑进安静的森林老河在那里转向小村庄"
        "镇上的人们每天早晨聚集在市场买面包和水果孩子们在石桥附近玩耍"
        "那座桥是很多年前由山谷里的工人建造的这个地区的天气温和田野几"
        "乎全年都是绿色的旅行者经常在这里休息欣赏远处的山景村里的老人"
        "喜欢在傍晚散步谈论过去的故事年轻人则在河边唱歌"
    ),
}

#: Chinese function characters used as the zh "stop-word" analogue.
ZH_STOP_CHARS: tuple[str, ...] = ("的", "是", "了", "在", "和", "那", "这", "们", "上", "里")


def words(lang: str) -> list[str]:
    """Whitespace tokens of a corpus (zh: individual characters)."""
    text = CORPORA[lang]
    if lang == "zh":
        return [c for c in text if not c.isspace()]
    return text.split()
