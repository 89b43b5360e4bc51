#!/usr/bin/env python3
"""Generate fixtures/langid/trigram_weights.tsv — the pinned per-language
char-trigram weight table behind graft.functions.LangIdNgram.

Model: hashed naive-Bayes-style log-odds. For each language L and md5
bucket b (3 hex chars of md5(trigram) => 4096 buckets):

    w_L[b] = round(10 * ln( ((c_L[b]+0.5) / (N_L+0.5*B))
                          / ((c_bg[b]+0.5) / (N_bg+0.5*B)) ))

where c_bg counts the OTHER languages' trigrams. Only positive weights
are kept (evidence FOR a language; absent buckets score 0), which keeps
the table sparse and makes "best score > 0" a meaningful und-gate.

Seed corpora are authored here (original sample sentences, not sourced
from any corpus) — a few hundred trigrams per language is plenty for a
4096-bucket table whose job is separating obviously-different languages
on short documents where word lexicons miss.

Rerun: python3 tools/gen_langid_weights.py
Writes fixtures/langid/trigram_weights.tsv AND the identical classpath
copy src/main/resources/langid/trigram_weights.tsv.
"""
import hashlib
import math
import os

BUCKETS = 4096

SEEDS = {
    "de": (
        "der schnelle braune fuchs springt über den faulen hund im garten "
        "während die kinder auf der wiese spielen und ihre mutter das "
        "abendessen in der küche vorbereitet heute ist ein schöner tag "
        "weil die sonne scheint und der himmel ganz blau ist wir möchten "
        "später noch einen spaziergang durch die stadt machen und danach "
        "ein gutes buch lesen die deutsche sprache hat viele lange wörter "
        "aber sie ist nicht so schwierig wie manche leute glauben bitte "
        "schön danke sehr guten morgen liebe freunde wie geht es euch "
        "heute abend gehen wir zusammen ins kino und essen etwas leckeres"
    ),
    "en": (
        "the quick brown fox jumps over the lazy dog in the garden while "
        "the children play on the meadow and their mother prepares dinner "
        "in the kitchen today is a beautiful day because the sun is "
        "shining and the sky is completely blue we would like to take a "
        "walk through the city later and then read a good book the "
        "english language has many short words and it is spoken in many "
        "countries around the world good morning dear friends how are "
        "you doing this evening we are going to the cinema together and "
        "we will eat something delicious afterwards thank you very much"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso en el "
        "jardín mientras los niños juegan en el prado y su madre prepara "
        "la cena en la cocina hoy es un día hermoso porque el sol brilla "
        "y el cielo está completamente azul nos gustaría dar un paseo "
        "por la ciudad más tarde y luego leer un buen libro la lengua "
        "española tiene muchas palabras bonitas y se habla en muchos "
        "países del mundo buenos días queridos amigos cómo están ustedes "
        "esta noche vamos juntos al cine y comeremos algo delicioso "
        "muchas gracias por todo hasta mañana señora por favor"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux dans "
        "le jardin pendant que les enfants jouent sur la prairie et que "
        "leur mère prépare le dîner dans la cuisine aujourd'hui c'est "
        "une belle journée parce que le soleil brille et le ciel est "
        "complètement bleu nous aimerions faire une promenade dans la "
        "ville plus tard et ensuite lire un bon livre la langue "
        "française a beaucoup de mots élégants et elle est parlée dans "
        "de nombreux pays du monde bonjour chers amis comment allez "
        "vous ce soir nous allons ensemble au cinéma et nous mangerons "
        "quelque chose de délicieux merci beaucoup à demain s'il vous plaît"
    ),
    "zh": (
        "敏捷的棕色狐狸跳过花园里那只懒惰的狗孩子们在草地上玩耍母亲在厨房里"
        "准备晚饭今天天气很好因为太阳照耀天空完全是蓝色的我们想晚些时候去城"
        "里散步然后读一本好书中文有很多有趣的汉字在世界上很多地方都有人说中"
        "文早上好亲爱的朋友们你们今天过得怎么样今晚我们一起去看电影然后吃一"
        "些好吃的东西非常感谢大家明天见请多多关照谢谢"
    ),
}


def bucket(tri: str) -> int:
    return int(hashlib.md5(tri.encode("utf-8")).hexdigest()[:3], 16)


def trigrams(text: str):
    t = text.lower()
    return [t[i:i + 3] for i in range(len(t) - 2)]


def main() -> None:
    counts = {}  # lang -> {bucket: n}
    totals = {}
    for lang, seed in SEEDS.items():
        c = {}
        for tri in trigrams(seed):
            b = bucket(tri)
            c[b] = c.get(b, 0) + 1
        counts[lang] = c
        totals[lang] = sum(c.values())

    langs = sorted(SEEDS)
    grand = sum(totals.values())
    rows = []
    for lang in langs:
        n_l = totals[lang]
        n_bg = grand - n_l
        for b, c_l in sorted(counts[lang].items()):
            c_bg = sum(counts[o].get(b, 0) for o in langs if o != lang)
            p_l = (c_l + 0.5) / (n_l + 0.5 * BUCKETS)
            p_bg = (c_bg + 0.5) / (n_bg + 0.5 * BUCKETS)
            w = round(10 * math.log(p_l / p_bg))
            if w > 0:
                rows.append((lang, b, w))

    header = (
        "# Pinned hashed char-trigram language-ID weights "
        "(graft.functions.LangIdNgram).\n"
        "# Format: lang<TAB>bucket<TAB>weight; bucket = first 3 hex chars "
        "of md5(utf8(trigram)) as an int (4096 buckets); weight = "
        "10x smoothed log-odds vs the other languages, positive only.\n"
        "# Generated by tools/gen_langid_weights.py from the authored "
        "seed corpora embedded there — rerun it to regenerate.\n"
    )
    body = "".join(f"{l}\t{b}\t{w}\n" for l, b, w in rows)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel in ("fixtures/langid/trigram_weights.tsv",
                "src/main/resources/langid/trigram_weights.tsv"):
        path = os.path.join(root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            f.write(header + body)
        print(f"wrote {path} ({len(rows)} rows, langs={langs})")


if __name__ == "__main__":
    main()
